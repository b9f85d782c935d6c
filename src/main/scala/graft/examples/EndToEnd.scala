package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.batch.{BatchProcess, LlmConfig}
import graft.core._
import graft.query.LogTable

/** End-to-end usage example, mirroring the reference's
  * examples/batch_run_example.py + batch_process_example.py:
  * build a prompt table → batch-process it with logging → analyze the
  * resulting event log (filter, JSON-extract, aggregate).
  *
  * Run: sbt "runMain graft.examples.EndToEnd"
  */
object EndToEnd {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // 1. input table of prompts (any DataFrame with a prompt column)
    val prompts = (1 to 20).map(i => s"Summarize document $i").toDF("prompt")

    // 2. a transport — in production this calls your provider; here a fake
    val transport: (String, Map[String, Any]) => String =
      (p, kw) => s"<${kw("model_name")}> summary of: $p"

    // 3. batch-process with logging + metadata
    val out = BatchProcess.run(spark, prompts,
      LlmConfig("demo-model", llmKwargs = Map("temperature" -> 0.2)),
      transport,
      job = JobConfig("demo", "summaries", "1.0.0"),
      processing = ProcessingConfig(maxConcurrency = 8, returnResults = true),
      storage = StorageConfig(logDir =
        java.nio.file.Files.createTempDirectory("graft_demo").toString))
    println(s"processed=${out.processed} logDir=${out.logDir}")
    out.results.foreach(_.take(3).foreach(r =>
      println(s"  #${r.index} ok=${r.ok} -> ${r.result.take(60)}")))

    // 4. read-side analytics over the log the run just wrote
    val logs = LogTable.read(spark, out.logDir)
    logs.eventCounts.show(truncate = false)
    logs.byEventType("llm_start").parsed
      .select(col("p.data.model").as("model"),
        element_at(col("p.data.prompts"), 1).as("prompt"))
      .show(3, truncate = false)

    spark.stop()
  }
}
