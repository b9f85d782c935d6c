package graft.query

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.LogEntry

/** LogRollup contract: partial states maintained per source file merge to
  * the same aggregates a full recompute gives, at every supported grain;
  * maintenance is incremental and replay-idempotent; the HLL
  * distinct-custom state unions correctly across generations; serving
  * reads are JSON-free and prune the store's date partitions; an empty
  * store reads as a typed zero-row frame.
  */
class LogRollupSpec extends SparkSpec {

  private def entry(i: Int): LogEntry = LogEntry(
    new java.sql.Timestamp(1700000000000L + (i % 5) * 86400000L),
    s"run-$i", "", s"cust-${i % 7}", if (i % 2 == 0) "llm_end" else "llm_start",
    """{"job":"spec"}""",
    s"""{"event_type":"e","data":{"model":"m${i % 3}","llm_type":"chat",
       |"usage_metadata":{"input_tokens":${10 * i},"output_tokens":$i,
       |"total_tokens":${11 * i}}${
         if (i % 6 == 0) s""","error":{"message":"boom-$i","type":"T"}"""
         else ""}}}""".stripMargin.replace("\n", ""))

  private def writeBatch(logDir: String, is: Range): Unit = {
    import spark.implicits._
    new graft.sink.ParquetDirSink(spark, logDir)
      .writeDataset(is.map(entry).toDF())
  }

  /** The truth the partials must merge back to: aggregate the full
    * shredded log directly at `grain`.
    */
  private def recompute(logDir: String, grain: Seq[String]) =
    ShreddedLog.shred(LogTable.read(spark, logDir).df)
      .groupBy(grain.map(col): _*)
      .agg(count(lit(1)).as("n_events"),
        count(when(col("event_type") === "llm_end", 1)).as("n_llm_end"),
        sum(col("input_tokens")).as("in_tokens"),
        sum(col("output_tokens")).as("out_tokens"),
        sum(col("total_tokens")).as("tot_tokens"),
        count(col("error_message")).as("n_errors"),
        min(unix_micros(col("timestamp"))).as("min_us"),
        max(unix_micros(col("timestamp"))).as("max_us"))

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.drop("n_custom_approx").collect().map(_.toString).sorted

  test("two-generation maintenance merges to the full recompute at " +
    "every grain; appendNew is incremental and replay-idempotent") {
    val root = java.nio.file.Files.createTempDirectory("rollup").toString
    val logDir = s"$root/log"
    val storeDir = s"$root/store"

    writeBatch(logDir, 0 until 60)
    val n0 = LogRollup.appendNew(spark, logDir, storeDir)
    assert(n0 > 0)
    assert(LogRollup.appendNew(spark, logDir, storeDir) === 0,
      "nothing new -> nothing processed")

    writeBatch(logDir, 60 until 90)
    val n1 = LogRollup.appendNew(spark, logDir, storeDir)
    assert(n1 > 0)

    for (grain <- Seq(Seq("date", "model"), Seq("model"), Seq("date"))) {
      assert(rows(LogRollup.read(spark, storeDir, grain)) ===
        rows(recompute(logDir, grain)), s"grain $grain diverged")
    }

    // replay: a full rebuild lands on the same partitions -> same rows
    val served = rows(LogRollup.read(spark, storeDir))
    LogRollup.build(spark, logDir, storeDir)
    assert(rows(LogRollup.read(spark, storeDir)) === served)
  }

  test("HLL distinct-custom state unions exactly at spec cardinality " +
    "and never exceeds the true distinct count's HLL error band") {
    val root = java.nio.file.Files.createTempDirectory("rollhll").toString
    writeBatch(s"$root/log", 0 until 50)
    LogRollup.build(spark, s"$root/log", s"$root/store")
    writeBatch(s"$root/log", 50 until 80)
    LogRollup.appendNew(spark, s"$root/log", s"$root/store")

    // 7 distinct customs spread over every (date, model) group; at this
    // cardinality the sketch is exact, so the union across generations
    // must be too
    val got = LogRollup.read(spark, s"$root/store", Seq("model"))
      .select("model", "n_custom_approx").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = ShreddedLog.shred(LogTable.read(spark, s"$root/log").df)
      .groupBy("model").agg(countDistinct("custom_id").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === want, s"got $got want $want")
  }

  test("serving reads are JSON-free and a date filter prunes the " +
    "store's hive partitions") {
    val root = java.nio.file.Files.createTempDirectory("rollplan").toString
    writeBatch(s"$root/log", 0 until 50)
    LogRollup.build(spark, s"$root/log", s"$root/store")

    val oneDay = LogRollup.read(spark, s"$root/store")
      .filter(col("date") === to_date(lit("2023-11-15")))
    val plan = oneDay.queryExecution.executedPlan.toString
    assert(!plan.contains("from_json") && !plan.contains("FromJson") &&
      !plan.contains("get_json_object"),
      s"JSON machinery leaked into a rollup serve plan:\n$plan")
    assert(plan.contains("PartitionFilters: [") &&
      plan.contains("isnotnull(date"),
      s"date filter did not reach the partition pruner:\n$plan")
    // pruned read still merges correctly for that day
    assert(rows(oneDay).length > 0)
  }

  test("an empty or never-maintained store reads as a typed zero-row " +
    "frame at every grain") {
    val root = java.nio.file.Files.createTempDirectory("rollempty").toString
    for (grain <- Seq(Seq("date", "model"), Seq("model"))) {
      val df = LogRollup.read(spark, s"$root/nostore", grain)
      assert(df.count() === 0L)
      assert(df.columns.contains("n_events") &&
        df.columns.contains("n_custom_approx"))
    }
    assert(!LogRollup.exists(spark, s"$root/nostore"))
  }
}
