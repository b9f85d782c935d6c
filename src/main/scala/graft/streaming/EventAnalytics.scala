package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming analytics over event streams — the unbounded twins
  * of the batch queries q_window_agg / q_sessionize. The same logical
  * operations run in both modes; streaming adds watermarks (bounded state,
  * late-data policy) and incremental execution.
  */
object EventAnalytics {

  final case class Ev(
      user_id: Long, ts: Timestamp, event_type: String, value: Double)

  final case class SessionState(
      startUs: Long, lastUs: Long, n: Long, sum: Double)

  final case class Session(
      user_id: Long, start_us: Long, end_us: Long, n_events: Long,
      sum_value: Double)

  /** Tumbling event-time window aggregation with a watermark: state for a
    * window is dropped once the watermark passes it, so executor state
    * stays bounded no matter how long the stream runs.
    */
  def windowedCounts(
      events: DataFrame,
      windowLen: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Gap-based sessionization with explicit per-key state
    * (`flatMapGroupsWithState` + event-time timeout): a session closes
    * when the watermark passes last-event + gap, emitting exactly one
    * Session row. State per user is O(1).
    */
  def sessionize(
      events: Dataset[Ev],
      gapMinutes: Int = 30,
      watermarkDelay: String = "10 seconds"): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(uid, s.startUs, s.lastUs, s.n, s.sum))
          } else {
            val sorted = evs.toVector.sortBy(e => tsUs(e.ts))
            var closed = Vector.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val us = tsUs(e.ts)
              cur match {
                case Some(s) if us - s.lastUs <= gapUs =>
                  cur = Some(SessionState(s.startUs, us, s.n + 1, s.sum + e.value))
                case Some(s) =>
                  closed :+= Session(uid, s.startUs, s.lastUs, s.n, s.sum)
                  cur = Some(SessionState(us, us, 1, e.value))
                case None =>
                  cur = Some(SessionState(us, us, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastUs / 1000 + gapUs / 1000)
            }
            closed.iterator
          }
      }
  }

  private def tsUs(ts: Timestamp): Long =
    ts.getTime * 1000 + (ts.getNanos / 1000) % 1000

  /** Streaming exact dedup with bounded state: duplicates arriving within
    * the watermark horizon are dropped
    * (`dropDuplicatesWithinWatermark`); state for ids older than the
    * watermark is evicted, so memory is bounded by the horizon's key
    * cardinality — the streaming twin of batch `q_dedup_exact`.
    */
  def dedupStream(
      events: DataFrame,
      idCols: Seq[String],
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(idCols)

  /** Gap sessionization via the BUILT-IN `session_window` operator in
    * streaming mode — the same declarative query as the batch
    * `q_session_window` oracle query, plus a watermark: the operator
    * manages merge state per (user, open session) and emits a session
    * exactly once, when the watermark passes its close. Contrast with
    * [[sessionize]]: identical semantics, zero custom state code.
    */
  def sessionWindows(
      events: DataFrame,
      gap: String = "30 minutes",
      watermark: String = "10 seconds"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("sum_value"))

  // --- streaming as-of join -------------------------------------------

  /** Unified input for [[asOfEnrich]]: clicks and purchases tagged into
    * one keyed stream (`kind` ∈ {"click", "purchase"}).
    */
  final case class AsOfIn(
      user_id: Long, ts: Timestamp, kind: String, event_id: Long,
      value: Double)

  final case class AsOfP(us: Long, id: Long, value: Double)
  final case class AsOfC(us: Long, id: Long)
  final case class AsOfBuf(purchases: List[AsOfP], clicks: List[AsOfC])

  /** One enriched click: the latest purchase at-or-before the click within
    * the horizon, or None if the user had no qualifying purchase.
    */
  final case class AsOfMatch(
      user_id: Long, click_id: Long, click_us: Long,
      purchase_id: Option[Long], purchase_us: Option[Long],
      purchase_value: Option[Double])

  /** Streaming AS-OF join (point-in-time enrichment) via
    * `flatMapGroupsWithState` — the true streaming twin of the batch
    * `q_asof_native` operator: each click gets the SINGLE latest purchase
    * with `p_ts ≤ c_ts` (within `horizonMinutes`), not every interval
    * match like [[clickPurchaseJoin]].
    *
    * Correctness under disorder: a click is emitted only once the
    * watermark strictly passes its event time — any purchase still in
    * flight must then have `p_ts ≥ watermark > c_ts` and so cannot change
    * the match (equality at the watermark stays pending: an event AT the
    * watermark is not yet late in Spark).
    * Clicks ahead of the watermark wait in state; an event-time timeout
    * re-fires the group when the watermark advances past them even if no
    * further events arrive for that user.
    *
    * Bounded state: buffered purchases older than `watermark − horizon`
    * can never match a future click (future clicks have
    * `c_ts > watermark`, and the horizon bounds how far back they look)
    * and are pruned every invocation, so per-user state is
    * O(rate × horizon) — same bound as the interval join, with single-row
    * as-of output.
    */
  def asOfEnrich(
      events: Dataset[AsOfIn],
      horizonMinutes: Int = 30,
      watermarkDelay: String = "10 seconds"): Dataset[AsOfMatch] = {
    import events.sparkSession.implicits._
    val horizonUs = horizonMinutes * 60L * 1000000L

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AsOfBuf, AsOfMatch](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, evs: Iterator[AsOfIn], state: GroupState[AsOfBuf]) =>
          val st = state.getOption.getOrElse(AsOfBuf(Nil, Nil))
          val incoming = evs.toVector
          val purchases =
            (st.purchases ++ incoming.filter(_.kind == "purchase")
              .map(e => AsOfP(tsUs(e.ts), e.event_id, e.value)))
              .sortBy(p => (p.us, p.id))
          val clicks =
            (st.clicks ++ incoming.filter(_.kind == "click")
              .map(e => AsOfC(tsUs(e.ts), e.event_id)))
              .sortBy(c => (c.us, c.id))
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          // Strictly below the watermark: an event AT the watermark is not
          // yet late in Spark, so a purchase with p.us == wmUs == c.us
          // could still arrive in a later batch — emitting that click now
          // would miss it. Strict `<` restores the invariant
          // p_ts > watermark > c_ts for every emitted click.
          val (ready, pending) = clicks.partition(_.us < wmUs)
          val out = ready.map { c =>
            val m = purchases
              .filter(p => p.us <= c.us && p.us >= c.us - horizonUs)
              .lastOption
            AsOfMatch(uid, c.id, c.us,
              m.map(_.id), m.map(_.us), m.map(_.value))
          }
          val keptPurchases = purchases.filter(_.us >= wmUs - horizonUs)
          if (pending.isEmpty && keptPurchases.isEmpty) state.remove()
          else {
            state.update(AsOfBuf(keptPurchases, pending.toList))
            // wake again once the watermark moves, to flush waiting clicks
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1000)
          }
          out.iterator
      }
  }

  /** Stream-stream interval join: each click joined to the same user's
    * purchases within `horizonMinutes` BEFORE the click — the streaming
    * twin of the batch/native as-of family (a windowed variant: all
    * matches in the interval, not just the latest, which is what
    * stream-stream joins can express with bounded state). Both sides
    * carry watermarks and the join condition bounds event-time distance,
    * so each side's buffered state is evicted once the watermark passes
    * the interval — state is O(rate × horizon), independent of stream
    * length.
    */
  def clickPurchaseJoin(
      clicks: DataFrame, // user_id, ts, click payload
      purchases: DataFrame, // user_id, ts, purchase payload
      horizonMinutes: Int = 30,
      watermark: String = "10 seconds"): DataFrame = {
    val c = clicks
      .withWatermark("ts", watermark)
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
    val p = purchases
      .withWatermark("ts", watermark)
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"), col("value").as("purchase_value"))
    c.join(p,
      col("c_user") === col("p_user") &&
        col("p_ts") <= col("c_ts") &&
        col("p_ts") >= col("c_ts") - expr(s"INTERVAL $horizonMinutes MINUTES"))
  }
}
