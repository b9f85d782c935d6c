package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import graft.core.LogEntry
import graft.sink.ParquetDirSink

/** End-to-end composition of the streaming READ path with the
  * exactly-once WRITE path: a live token-usage dashboard fed by a growing
  * log dir ([[LogStream]]) lands its windowed aggregates through
  * [[IdempotentSink]], and neither a batch re-delivery nor a full
  * stop/restart from the same checkpoint can double a window for the
  * reader.
  */
class LogStreamExactlyOnceSpec extends SparkSpec {

  private def ts(minute: Int) = new Timestamp(1700000000000L + minute * 60000L)

  private def llmEnd(minute: Int, customId: String, tokens: Long) =
    LogEntry(ts(minute), s"run-$minute-$customId", "", customId, "llm_end",
      "{}", s"""{"event_type":"llm_end","data":{"usage_metadata":{"input_tokens":1,"output_tokens":1,"total_tokens":$tokens}}}""")

  private def committedUsage(out: String) = {
    val df = IdempotentSink.readCommitted(spark, out)
    df.selectExpr("window.start AS ws", "custom_id", "total_tokens",
      "n_calls").orderBy("ws", "custom_id").collect()
      .map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2),
        r.getLong(3))).toSeq
  }

  test("token-usage windows land exactly once through IdempotentSink " +
    "across replay and checkpoint restart") {
    val logDir = java.nio.file.Files.createTempDirectory("ls_once_log").toString
    val out = java.nio.file.Files.createTempDirectory("ls_once_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ls_once_ck").toString
    val sink = new ParquetDirSink(spark, logDir)
    def start() = IdempotentSink.start(
      LogStream.tokenUsage(LogStream.read(spark, logDir),
        watermark = "10 minutes", windowLength = "1 hour"),
      out, ckpt)

    // window 1 activity (ts base 22:13 UTC → the 22:00–23:00 window)
    sink.write(Seq(llmEnd(1, "a", 100), llmEnd(2, "a", 50), llmEnd(3, "b", 30)))
    val q1 = start()
    try {
      q1.processAllAvailable()
      // watermark has not passed 23:00 yet — appended-mode agg emits nothing
      assert(committedUsage(out).isEmpty)
      // minute 70 (23:23) advances the watermark past 23:00: window 1 closes
      sink.write(Seq(llmEnd(70, "a", 7)))
      q1.processAllAvailable()
    } finally q1.stop()
    val w1 = committedUsage(out)
    assert(w1.map(t => (t._2, t._3, t._4)) === Seq(("a", 150L, 2L), ("b", 30L, 1L)),
      s"window-1 aggregates wrong: $w1")

    // late RE-DELIVERY of every committed batch id must be a skip — the
    // reader's view cannot change
    import spark.implicits._
    val committedIds = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.matches("batch=\\d+"))
      .map(_.getName.stripPrefix("batch=").toLong)
    assert(committedIds.nonEmpty)
    committedIds.foreach { id =>
      assert(!IdempotentSink.writeBatch(
        Seq(("poison", 999L)).toDF("custom_id", "total_tokens"), out, id))
    }
    assert(committedUsage(out) === w1)

    // stop/restart from the SAME checkpoint: at-least-once re-delivery of
    // the last batch is exactly the case the sink must absorb
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(committedUsage(out) === w1, "restart doubled a window")
      // minute 130 closes window 2 (23:00–24:00, containing minute 70)
      sink.write(Seq(llmEnd(130, "c", 1)))
      q2.processAllAvailable()
    } finally q2.stop()
    val w2 = committedUsage(out)
    assert(w2.map(t => (t._2, t._3, t._4))
      === Seq(("a", 150L, 2L), ("b", 30L, 1L), ("a", 7L, 1L)),
      s"window-2 aggregates wrong: $w2")
    // every (window, custom_id) key appears exactly once for the reader
    assert(w2.map(t => (t._1, t._2)).distinct.length === w2.length)
  }
}
