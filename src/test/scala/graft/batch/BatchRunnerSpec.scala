package graft.batch

import java.util.concurrent.atomic.AtomicInteger

import graft.SparkSpec
import graft.core.{ColumnConfig, JobConfig, ProcessingConfig, StorageConfig}

class BatchRunnerSpec extends SparkSpec {

  test("order-preserving map with results (test_batch.py:17-37)") {
    import spark.implicits._
    val ds = (0 until 50).map(i => s"prompt-$i").toDS().repartition(4)
    val inputOrder = ds.collect() // the dataset's own (post-shuffle) order
    val out = BatchRunner.batchRun[String, String](ds,
      p => s"echo:$p", maxConcurrency = 8).collect()
    assert(out.length === 50)
    assert(out.map(_.index).toSeq === (0L until 50L))
    assert(out.forall(_.ok))
    // positional alignment: result i corresponds to input row i
    assert(out.map(_.value.get).toSeq === inputOrder.map(p => s"echo:$p").toSeq)
  }

  test("error-as-value keeps the job alive (test_batch.py:129-161)") {
    import spark.implicits._
    val ds = (0 until 10).toDS()
    val out = BatchRunner.batchRun[Int, Int](ds,
      i => if (i % 3 == 0) sys.error(s"boom-$i") else i * 2,
      maxConcurrency = 4).collect()
    assert(out.count(!_.ok) === 4) // 0,3,6,9
    assert(out.filter(_.ok).forall(r => r.value.get === r.index * 2))
    assert(out.find(_.index == 3L).get.error.get.contains("boom-3"))
  }

  test("per-partition concurrency is bounded (test_batch.py:163-199)") {
    import spark.implicits._
    // static holder: closures are serialized even in local mode, so plain
    // captured AtomicIntegers would be copied per task
    BatchRunnerSpec.inFlight.set(0)
    BatchRunnerSpec.maxSeen.set(0)
    val ds = (0 until 40).toDS().repartition(1)
    BatchRunner.batchRun[Int, Int](ds, { i =>
      val now = BatchRunnerSpec.inFlight.incrementAndGet()
      BatchRunnerSpec.maxSeen.updateAndGet(m => math.max(m, now))
      Thread.sleep(5)
      BatchRunnerSpec.inFlight.decrementAndGet()
      i
    }, maxConcurrency = 4).collect()
    assert(BatchRunnerSpec.maxSeen.get() <= 4,
      s"saw ${BatchRunnerSpec.maxSeen.get()} in flight")
    assert(BatchRunnerSpec.maxSeen.get() >= 2, "pool did not parallelize")
  }

  test("empty input (test_batch.py:72-84)") {
    import spark.implicits._
    val out = BatchRunner.batchRun[Int, Int](
      spark.emptyDataset[Int], i => i, 4).collect()
    assert(out.isEmpty)
  }

  test("sink-only mode runs for side effects (test_batch.py:55-70)") {
    import spark.implicits._
    val counter = spark.sparkContext.longAccumulator("n")
    BatchRunner.batchRunForeach[Int]((0 until 20).toDS(),
      _ => counter.add(1), maxConcurrency = 4)
    assert(counter.value === 20L)
  }

  test("column validation (test_batch_process.py:299-317)") {
    import spark.implicits._
    val df = Seq(("a", 1)).toDF("prompt", "id")
    BatchRunner.validateColumns(df, ColumnConfig()) // ok
    intercept[IllegalArgumentException] {
      BatchRunner.validateColumns(df, ColumnConfig(promptColumn = "missing"))
    }
  }

  test("path templating + version sanitization (test_batch_process.py:219-252)") {
    val job = JobConfig("support", "tickets", "2.1.0")
    val p = BatchRunner.resolvePath(
      "{job_category}/{job_subcategory}/v{job_version_safe}/{date}",
      job, "2024-01-15")
    assert(p === "support/tickets/v2_1_0/2024-01-15")
  }

  test("metadata enrichment carries nested batch config (batch.py:226-254)") {
    val md = BatchRunner.loggerMetadata(JobConfig(), ProcessingConfig(),
      StorageConfig(), "2024-01-15T00:00:00Z", 123L)
    assert(md("batch_size") === 123L)
    assert(md("job_category") === "default")
    val bc = md("batch_config").asInstanceOf[Map[String, Any]]
    assert(bc("processing").asInstanceOf[Map[String, Any]]("max_concurrency") === 100)
  }

  test("env-var S3 fallback (test_batch_process.py:319-360)") {
    assert(BatchRunner.s3FromEnv(Map.empty).isEmpty)
    val cfg = BatchRunner.s3FromEnv(Map("LANGCHAIN_S3_BUCKET" -> "b1"))
    assert(cfg.get.bucket === "b1")
  }
}

object BatchRunnerSpec {
  val inFlight = new AtomicInteger(0)
  val maxSeen = new AtomicInteger(0)
}
