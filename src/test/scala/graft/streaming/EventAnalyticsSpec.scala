package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.streaming.EventAnalytics.{Ev, Session}

final case class EvId(event_id: Long, user_id: Long, ts: Timestamp,
    event_type: String, value: Double)

class EventAnalyticsSpec extends SparkSpec {

  private def ts(minute: Int) = new Timestamp(1700000000000L + minute * 60000L)

  test("windowed aggregation over a stream matches incremental batches") {
    import spark.implicits._
    val stream = MemoryStream(implicitly[org.apache.spark.sql.Encoder[Ev]], spark)
    val q = EventAnalytics.windowedCounts(stream.toDF(), "10 minutes", "5 minutes")
      .writeStream.outputMode(OutputMode.Complete)
      .format("memory").queryName("win").start()
    try {
      stream.addData(
        Ev(1, ts(0), "click", 1.0), Ev(1, ts(1), "click", 2.0),
        Ev(2, ts(11), "view", 3.0))
      q.processAllAvailable()
      stream.addData(Ev(1, ts(12), "click", 4.0))
      q.processAllAvailable()
      val rows = spark.table("win")
        .orderBy("window_start", "event_type").collect()
      assert(rows.length === 3)
      assert(rows.map(_.getLong(2)).toSeq === Seq(2L, 1L, 1L))
      assert(rows(0).getDouble(3) === 3.0) // 1.0 + 2.0 in first window
    } finally q.stop()
  }

  test("KLL sketch aggregate runs inside a streaming window: state-store " +
    "merges preserve the rank contract across micro-batches") {
    import spark.implicits._
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val stream = MemoryStream(implicitly[org.apache.spark.sql.Encoder[Ev]], spark)
    val windowed = stream.toDF()
      .withWatermark("ts", "5 minutes")
      .groupBy(org.apache.spark.sql.functions.window(
        org.apache.spark.sql.functions.col("ts"), "60 minutes"))
      .agg(org.apache.spark.sql.functions.expr(
        "kll_sketch_quantile(kll_sketch_agg(value, 200), 0.5D)").as("p50"))
    val q = windowed.writeStream.outputMode(OutputMode.Complete)
      .format("memory").queryName("kllwin").start()
    try {
      // two micro-batches into one window: the second batch's partial
      // sketch must MERGE with the stored state, not replace it
      val batch1 = (1 to 50).map(i => Ev(1, ts(i % 30), "click", i.toDouble))
      val batch2 = (51 to 100).map(i => Ev(1, ts(i % 30), "click", i.toDouble))
      stream.addData(batch1: _*)
      q.processAllAvailable()
      stream.addData(batch2: _*)
      q.processAllAvailable()
      val p50 = spark.table("kllwin").collect().head.getDouble(1)
      // exact median of 1..100 is 50/51; sketch at k=200 over 100 values
      // is exact, so the estimate must be one of the two middle elements
      assert(p50 >= 50.0 && p50 <= 51.0, s"merged p50 = $p50")
    } finally q.stop()
  }

  test("streaming dedup drops duplicates within the watermark horizon") {
    import spark.implicits._
    val stream = MemoryStream(implicitly[org.apache.spark.sql.Encoder[Ev]], spark)
    val q = EventAnalytics.dedupStream(stream.toDF(),
        Seq("user_id", "event_type"), watermark = "30 minutes")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("dedup").start()
    try {
      stream.addData(
        Ev(1, ts(0), "click", 1.0), Ev(1, ts(1), "click", 2.0), // dup key
        Ev(2, ts(1), "click", 3.0))
      q.processAllAvailable()
      stream.addData(Ev(1, ts(2), "click", 9.0)) // still within horizon
      q.processAllAvailable()
      assert(spark.table("dedup").count() === 2L) // (1,click), (2,click)
    } finally q.stop()
  }

  test("stateful sessionization closes sessions when the watermark passes " +
    "the gap") {
    import spark.implicits._
    val stream = MemoryStream(implicitly[org.apache.spark.sql.Encoder[Ev]], spark)
    val q = EventAnalytics.sessionize(stream.toDS(), gapMinutes = 5)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("sessions").start()
    try {
      // session 1: two events 1 min apart
      stream.addData(Ev(7, ts(0), "click", 1.0), Ev(7, ts(1), "click", 2.0))
      q.processAllAvailable()
      // 20 minutes later: advances the watermark past session 1's gap AND
      // starts session 2 (the in-batch gap split also fires)
      stream.addData(Ev(7, ts(20), "click", 5.0))
      q.processAllAvailable()
      stream.addData(Ev(7, ts(40), "click", 9.0))
      q.processAllAvailable()

      val sessions = spark.table("sessions").as[Session]
        .collect().sortBy(_.start_us)
      assert(sessions.length >= 2)
      assert(sessions(0).n_events === 2L)
      assert(sessions(0).sum_value === 3.0)
      assert(sessions(1).n_events === 1L)
      assert(sessions(1).sum_value === 5.0)
    } finally q.stop()
  }

  test("built-in session_window streams: a session emits once its gap passes") {
    import spark.implicits._
    val stream = MemoryStream(implicitly[org.apache.spark.sql.Encoder[Ev]], spark)
    val q = EventAnalytics.sessionWindows(stream.toDF(), gap = "10 minutes")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("swin").start()
    try {
      // session: two events 1 min apart, then 40 min of silence advances
      // the watermark past session close
      stream.addData(Ev(3, ts(0), "click", 1.0), Ev(3, ts(1), "click", 2.0))
      q.processAllAvailable()
      stream.addData(Ev(3, ts(41), "click", 7.0))
      q.processAllAvailable()
      val rows = spark.table("swin").orderBy("session_start").collect()
      assert(rows.length === 1) // second session still open
      assert(rows.head.getLong(3) === 2L)
      assert(rows.head.getDouble(4) === 3.0)
    } finally q.stop()
  }

  test("stream-stream interval join buffers only the horizon " +
    "(clicks x purchases within 30 minutes before)") {
    import spark.implicits._
    val clicks = MemoryStream(implicitly[org.apache.spark.sql.Encoder[EvId]], spark)
    val purchases = MemoryStream(implicitly[org.apache.spark.sql.Encoder[EvId]], spark)
    val q = EventAnalytics.clickPurchaseJoin(
        clicks.toDF(), purchases.toDF(), horizonMinutes = 30)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("ssjoin").start()
    try {
      purchases.addData(
        EvId(100, 1, ts(5), "purchase", 9.99), // 5 min before click: joins
        EvId(101, 1, ts(50), "purchase", 1.0), // after the click: no join
        EvId(102, 2, ts(8), "purchase", 2.0)) // other user: no join
      clicks.addData(EvId(200, 1, ts(10), "click", 0.0))
      q.processAllAvailable()
      val rows = spark.table("ssjoin")
        .select("click_id", "purchase_id", "purchase_value").collect()
      assert(rows.length === 1)
      assert(rows.head.getLong(0) === 200L)
      assert(rows.head.getLong(1) === 100L)
      assert(rows.head.getDouble(2) === 9.99)
    } finally q.stop()
  }

  test("streaming as-of join: each click gets the single latest prior " +
    "purchase once the watermark passes it; horizon and no-match produce " +
    "None") {
    import spark.implicits._
    import EventAnalytics.{AsOfIn, AsOfMatch}
    val stream = MemoryStream(
      implicitly[org.apache.spark.sql.Encoder[AsOfIn]], spark)
    val q = EventAnalytics.asOfEnrich(stream.toDS(),
        horizonMinutes = 30, watermarkDelay = "1 minute")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("asof").start()
    try {
      stream.addData(
        AsOfIn(1, ts(2), "purchase", 100, 5.0),
        AsOfIn(1, ts(10), "purchase", 101, 7.0),
        // arrives before its matching purchase in processing order — the
        // event-time sort inside the handler must still match it to 101
        AsOfIn(1, ts(12), "click", 201, 0.0),
        AsOfIn(1, ts(5), "click", 200, 0.0),
        AsOfIn(1, ts(50), "click", 202, 0.0), // >30 min after any purchase
        AsOfIn(2, ts(12), "click", 300, 0.0)) // user 2 never purchases
      q.processAllAvailable()
      // advance the watermark past every click (wm = t119); the event-time
      // timeout flushes waiting clicks with no further user-1/2 events
      stream.addData(AsOfIn(99, ts(120), "purchase", 999, 1.0))
      q.processAllAvailable()
      stream.addData(AsOfIn(99, ts(240), "purchase", 998, 1.0))
      q.processAllAvailable()

      val rows = spark.table("asof").as[AsOfMatch].collect()
        .sortBy(m => (m.user_id, m.click_id))
      assert(rows.map(m => (m.user_id, m.click_id)).toSeq ===
        Seq((1L, 200L), (1L, 201L), (1L, 202L), (2L, 300L)))
      assert(rows(0).purchase_id === Some(100L)) // latest ≤ t5 is t2
      assert(rows(0).purchase_value === Some(5.0))
      assert(rows(1).purchase_id === Some(101L)) // latest ≤ t12 is t10
      assert(rows(2).purchase_id === None) // t10 is 40 min back: horizon
      assert(rows(3).purchase_id === None) // no purchase for user 2
    } finally q.stop()
  }
}
