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
