package graft.batch

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core._

class BatchProcessSpec extends SparkSpec {

  private val echo: (String, Map[String, Any]) => String =
    (p, kw) => s"[${kw("model_name")}] $p"

  test("LlmConfig merges kwargs and logs start/end around calls " +
    "(test_config.py:13-119)") {
    val cfg = LlmConfig("gpt-test",
      llmKwargs = Map("temperature" -> 0.1, "seed" -> 1),
      modelKwargs = Map("temperature" -> 0.7)) // model kwargs win
    assert(cfg.mergedKwargs("temperature") === 0.7)
    assert(cfg.mergedKwargs("model_name") === "gpt-test")

    val sink = new CollectingSink
    val logger = new graft.ingest.ParquetLogger(sink,
      EventType.Default, Map.empty, FixedClock(1700000000000000L))
    val client = cfg.createLlm(echo, Seq(logger), () => "run-1")
    assert(client.invoke("hi") === "[gpt-test] hi")
    assert(sink.entries.map(_.event_type).toSeq === Seq("llm_start", "llm_end"))
    assert(sink.entries.head.payload.contains(""""prompts":["hi"]"""))

    intercept[RuntimeException] {
      cfg.createLlm((_, _) => sys.error("api down"), Seq(logger), () => "run-2")
        .invoke("x")
    }
    assert(sink.entries.last.event_type === "llm_error")
  }

  test("batch_process end to end: results + partitioned event log " +
    "(test_batch_process.py:45-80)") {
    import spark.implicits._
    val logRoot = Files.createTempDirectory("bp").toString
    val df = (1 to 9).map(i => s"prompt-$i").toDF("prompt")
    val out = BatchProcess.run(spark, df,
      LlmConfig("m1"), echo,
      job = JobConfig("support", "faq", "1.2.0"),
      processing = ProcessingConfig(maxConcurrency = 4, returnResults = true),
      storage = StorageConfig(logDir = logRoot),
      clock = FixedClock(1700000000000000L),
      env = Map.empty)

    assert(out.processed === 9L)
    assert(out.logDir === s"$logRoot/support/faq/v1_2_0")
    val results = out.results.get.sortBy(_.index)
    assert(results.forall(_.ok))
    assert(results.map(_.result).forall(_.startsWith("[m1] prompt-")))

    // the event log landed date-partitioned with 2 events per row
    val log = spark.read.parquet(out.logDir)
    assert(log.count() === 18L)
    assert(log.filter(col("event_type") === "llm_end").count() === 9L)
    assert(new java.io.File(out.logDir).listFiles()
      .exists(_.getName.startsWith("date=2023-11-14")))
    // metadata enrichment travels on every entry
    val md = log.select("logger_metadata").head().getString(0)
    assert(md.contains(""""job_category":"support""""))
    assert(md.contains(""""batch_size":9"""))
  }

  test("errors land as rows and the job completes (B3)") {
    import spark.implicits._
    val logRoot = Files.createTempDirectory("bp2").toString
    val flaky: (String, Map[String, Any]) => String =
      (p, _) => if (p.endsWith("3")) sys.error("boom") else s"ok:$p"
    val out = BatchProcess.run(spark,
      (1 to 5).map(i => s"p$i").toDF("prompt"),
      LlmConfig("m"), flaky,
      processing = ProcessingConfig(maxConcurrency = 2, returnResults = true),
      storage = StorageConfig(logDir = logRoot),
      clock = FixedClock(1700000000000000L), env = Map.empty)
    val rows = out.results.get.sortBy(_.index)
    assert(rows.count(!_.ok) === 1)
    assert(rows(2).error.contains("boom"))
    // the failed row still logged llm_start + llm_error
    val log = spark.read.parquet(out.logDir)
    assert(log.filter(col("event_type") === "llm_error").count() === 1L)
  }

  test("knownSize skips the extra input scan and rides into metadata") {
    import spark.implicits._
    val logRoot = Files.createTempDirectory("bp3").toString
    val out = BatchProcess.run(spark, (1 to 3).map(i => s"p$i").toDF("prompt"),
      LlmConfig("m"), echo,
      processing = ProcessingConfig(maxConcurrency = 2),
      storage = StorageConfig(logDir = logRoot),
      clock = FixedClock(1700000000000000L), env = Map.empty,
      // a deliberately wrong size proves the passed value is used verbatim
      // (no df.count() ran to overwrite it)
      knownSize = Some(42L))
    val md = spark.read.parquet(out.logDir)
      .select("logger_metadata").head().getString(0)
    assert(md.contains(""""batch_size":42"""))
    assert(out.processed === 3L)
  }

  test("missing prompt column fails fast (test_batch_process.py:299-317)") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      BatchProcess.run(spark, Seq(1).toDF("not_prompt"),
        LlmConfig("m"), echo, env = Map.empty)
    }
  }
}
