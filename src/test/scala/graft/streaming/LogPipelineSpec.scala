package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.LogEntry
import graft.query.{LogRollup, ShreddedLog}

/** The one-tick ingest pipeline (land → shred → rollup) is exactly-once
  * end-to-end across every crash/replay cut point: a batch re-delivered
  * after a crash BEFORE, BETWEEN, or AFTER any stage leaves all three
  * stores with exactly-once content, and the dashboard contract
  * (`q_rollup_tokens`'s serve path) is unchanged by replays.
  */
class LogPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def entry(i: Int, model: String, tok: Int) = LogEntry(
    new Timestamp(1700000000000L + i * 3600000L), s"run-$i", "", s"c$i",
    "llm_end", "{}",
    s"""{"event_type":"llm_end","data":{"model":"$model",""" +
      s""""usage_metadata":{"input_tokens":$tok,"output_tokens":1,""" +
      s""""total_tokens":${tok + 1}}}}""")

  private def df(es: Seq[LogEntry]): DataFrame = es.toDF()

  // batches: b0 = 4×m0(tok 10), b1 = 3×m1(tok 20), b2 = 2×m0(tok 5)
  private val b0 = (0 until 4).map(i => entry(i, "m0", 10))
  private val b1 = (10 until 13).map(i => entry(i, "m1", 20))
  private val b2 = (20 until 22).map(i => entry(i, "m0", 5))

  private def dashboard(rollupDir: String): Map[String, (Long, Long)] =
    LogRollup.read(spark, rollupDir, Seq("model"))
      .select("model", "n_events", "tot_tokens").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("crash/replay at every stage boundary stays exactly-once; the " +
    "dashboard is unchanged by replays") {
    val logDir = Files.createTempDirectory("pipe_log").toString
    val shredDir = Files.createTempDirectory("pipe_shred").toString
    val rollupDir = Files.createTempDirectory("pipe_roll").toString
    def tick(es: Seq[LogEntry], id: Long): Unit =
      LogStreamPipeline.tick(df(es), id, logDir, shredDir, rollupDir)

    // batch 0: clean tick
    tick(b0, 0L)
    // batch 1: crash AFTER land, BEFORE shred → whole-batch replay
    LogStreamPipeline.land(df(b1), 1L, logDir)
    tick(b1, 1L)
    // batch 2: crash AFTER land + shred, BEFORE rollup → replay
    LogStreamPipeline.land(df(b2), 2L, logDir)
    ShreddedLog.appendBatch(df(b2), 2L, shredDir)
    tick(b2, 2L)

    val want = Map("m0" -> (6L, 4 * 11L + 2 * 6L), "m1" -> (3L, 3 * 21L))
    val before = dashboard(rollupDir)
    assert(before === want, s"got $before")
    assert(spark.read.parquet(logDir).count() === 9L)
    assert(ShreddedLog.read(spark, shredDir).count() === 9L)

    // late replay of ALREADY-COMPLETE ticks (at-least-once delivery's
    // worst case): every store overwrites itself, dashboard identical
    tick(b0, 0L)
    tick(b2, 2L)
    assert(dashboard(rollupDir) === before)
    assert(spark.read.parquet(logDir).count() === 9L)
    assert(ShreddedLog.read(spark, shredDir).count() === 9L)
    // shred store stayed JSON-free on the serve path and typed
    val plan = ShreddedLog.read(spark, shredDir)
      .filter(col("model") === "m0")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("from_json") && !plan.contains("JsonToStructs"))
  }

  test("the StreamingLogPipeline wrapper drives all three stores from " +
    "one checkpointed stream and drains on stop") {
    val logDir = Files.createTempDirectory("pipew_log").toString
    val shredDir = Files.createTempDirectory("pipew_shred").toString
    val rollupDir = Files.createTempDirectory("pipew_roll").toString
    val ckpt = Files.createTempDirectory("pipew_ckpt").toString
    val w = new StreamingLogPipeline(
      spark, logDir, shredDir, rollupDir, ckpt).start()
    w.log(b0: _*)
    w.processAllAvailable()
    w.log(b1: _*)
    w.stop() // tail batch must drain through the FULL tick

    assert(spark.read.parquet(logDir).count() === 7L)
    assert(ShreddedLog.read(spark, shredDir).count() === 7L)
    assert(dashboard(rollupDir) ===
      Map("m0" -> (4L, 4 * 11L), "m1" -> (3L, 3 * 21L)))
    // landed layout keeps the log's hive date= level (S1 contract) with
    // the batch= replay level nested inside
    assert(new java.io.File(logDir).listFiles()
      .exists(_.getName.startsWith("date=")))
  }
}
