package graft.retrieve

/** A4: shared rate-limit state (background_retrieval.py:124-183).
  *
  * The reference tracks `remaining`/`reset` from response headers in
  * process-local state. Across executors there is no shared memory, so the
  * Spark-native design is a **per-partition token bucket** sized from the
  * global budget (`globalPerSecond / numPartitions`): each task throttles
  * independently and the fleet in aggregate respects the budget. Header
  * feedback (`remaining`, `resetAtMs`) tightens the local bucket when the
  * provider signals pressure — same information flow as the reference,
  * partition-local scope (documented divergence; the reference's state is
  * process-local anyway).
  */
final class RateLimiter(
    permitsPerSecond: Double,
    nowMs: () => Long = () => System.currentTimeMillis(),
    sleep: Long => Unit = Thread.sleep) extends Serializable {

  private var tokens: Double = permitsPerSecond
  private var lastRefillMs: Long = nowMs()
  private var pausedUntilMs: Long = 0L

  /** Block until a permit is available, then take it. */
  def acquire(): Unit = synchronized {
    val now = nowMs()
    if (now < pausedUntilMs) sleep(pausedUntilMs - now)
    refill()
    while (tokens < 1.0) {
      val waitMs = math.ceil((1.0 - tokens) / permitsPerSecond * 1000).toLong
      sleep(math.max(1, waitMs))
      refill()
    }
    tokens -= 1.0
  }

  /** Feed provider headers back into the local bucket: when the provider
    * says no budget remains, pause until the advertised reset.
    */
  def onHeaders(remaining: Option[Long], resetAtMs: Option[Long]): Unit =
    synchronized {
      (remaining, resetAtMs) match {
        case (Some(r), Some(reset)) if r <= 0 =>
          pausedUntilMs = math.max(pausedUntilMs, reset)
        case (Some(r), _) =>
          tokens = math.min(tokens, r.toDouble)
        case _ => ()
      }
    }

  private def refill(): Unit = {
    val now = nowMs()
    val elapsed = (now - lastRefillMs) / 1000.0
    if (elapsed > 0) {
      tokens = math.min(permitsPerSecond, tokens + elapsed * permitsPerSecond)
      lastRefillMs = now
    }
  }

  /** Partition-local limiter from a global budget. */
  def forPartitions(n: Int): RateLimiter =
    new RateLimiter(math.max(0.1, permitsPerSecond / math.max(1, n)),
      nowMs, sleep)
}
