package graft.batch

import java.util.concurrent.{Executors, TimeUnit}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{ColumnConfig, JobConfig, ProcessingConfig, S3Config, StorageConfig}

/** Distributed result slot: error-as-value (B3) — a task never fails
  * because one row's call failed; the exception travels in the row.
  */
final case class BatchResult[O](
    index: Long,
    ok: Boolean,
    value: Option[O],
    error: Option[String])

/** B1–B5: the bounded-concurrency batch dataflow driver, re-expressed for
  * Spark's execution model (reference batch.py:20-132).
  *
  * The reference fans out `max_concurrency` async calls from one process;
  * here the input Dataset is partitioned across executors and each
  * partition runs a bounded worker pool, so global in-flight concurrency ≈
  * numPartitions × perPartitionConcurrency. Order is preserved by indexing
  * rows before the shuffle and sorting the result (B1; the reference
  * relies on abatch's positional guarantee).
  *
  * At 100 TB the input never collects to the driver: `returnResults=false`
  * (B4) runs the map purely for its side effects via `foreachPartition`.
  */
object BatchRunner {

  /** Row-wise map with bounded per-partition concurrency and
    * error-as-value results, order-preserving.
    */
  def batchRun[I, O](
      ds: Dataset[I],
      fn: I => O,
      maxConcurrency: Int = 10,
      returnExceptions: Boolean = true)(
      implicit encI: Encoder[(I, Long)],
      encR: Encoder[BatchResult[O]]): Dataset[BatchResult[O]] = {

    val numParts = math.max(1, ds.rdd.getNumPartitions)
    val perPartition = math.max(1, maxConcurrency / numParts)

    val indexed: Dataset[(I, Long)] =
      ds.sparkSession.createDataset(ds.rdd.zipWithIndex())(encI)

    val mapped = indexed.mapPartitions { rows =>
      boundedMap(rows, fn, perPartition, returnExceptions)
    }(encR)
    mapped.orderBy(col("index"))
  }

  /** B4: memory-efficient sink-only mode — run for side effects. */
  def batchRunForeach[I](
      ds: Dataset[I],
      fn: I => Unit,
      maxConcurrency: Int = 10): Unit = {
    val numParts = math.max(1, ds.rdd.getNumPartitions)
    val perPartition = math.max(1, maxConcurrency / numParts)
    ds.foreachPartition { (rows: Iterator[I]) =>
      boundedMap[I, Unit](rows.zipWithIndex.map { case (r, i) => (r, i.toLong) },
        fn, perPartition, returnExceptions = true).foreach(_ => ())
    }
  }

  /** Bounded worker pool over one partition's rows: at most `width`
    * in-flight calls, results in input order.
    */
  private def boundedMap[I, O](
      rows: Iterator[(I, Long)],
      fn: I => O,
      width: Int,
      returnExceptions: Boolean): Iterator[BatchResult[O]] = {
    if (!rows.hasNext) return Iterator.empty
    val pool = Executors.newFixedThreadPool(width)
    try {
      val out = new ArrayBuffer[BatchResult[O]]()
      rows.grouped(width * 4).foreach { chunk =>
        val futures = chunk.map { case (row, idx) =>
          idx -> pool.submit(new java.util.concurrent.Callable[Either[Throwable, O]] {
            def call(): Either[Throwable, O] =
              try Right(fn(row)) catch { case e: Throwable => Left(e) }
          })
        }
        futures.foreach { case (idx, f) =>
          f.get() match {
            case Right(v) => out += BatchResult(idx, ok = true, Some(v), None)
            case Left(e) if returnExceptions =>
              out += BatchResult[O](idx, ok = false, None,
                Some(s"${e.getClass.getSimpleName}: ${e.getMessage}"))
            case Left(e) => throw e
          }
        }
      }
      out.iterator
    } finally {
      pool.shutdown()
      pool.awaitTermination(60, TimeUnit.SECONDS)
    }
  }

  /** B5: required-column validation (batch.py:191-193). */
  def validateColumns(ds: Dataset[_], cols: ColumnConfig): Unit =
    require(ds.schema.fieldNames.contains(cols.promptColumn),
      s"DataFrame must contain prompt column '${cols.promptColumn}'")

  /** B6: path templating with sanitized version (batch.py:197-224). */
  def resolvePath(template: String, job: JobConfig, date: String): String =
    template
      .replace("{job_category}", job.category)
      .replace("{job_subcategory}", job.subcategory)
      .replace("{job_version}", job.version)
      .replace("{job_version_safe}", job.versionSafe)
      .replace("{date}", date)

  /** B7: logger-metadata enrichment (batch.py:226-254): legacy flat fields
    * plus the full nested batch config, batch start time, input size.
    */
  def loggerMetadata(
      job: JobConfig,
      processing: ProcessingConfig,
      storage: StorageConfig,
      batchStartedAtIso: String,
      batchSize: Long): Map[String, Any] =
    Map(
      "job_category" -> job.category,
      "job_subcategory" -> job.subcategory,
      "job_version" -> job.version,
      "batch_config" -> Map(
        "job" -> Map("category" -> job.category,
          "subcategory" -> job.subcategory, "version" -> job.version),
        "processing" -> Map(
          "max_concurrency" -> processing.maxConcurrency,
          "buffer_size" -> processing.bufferSize,
          "return_results" -> processing.returnResults),
        "storage" -> Map("log_dir" -> storage.logDir,
          "path_template" -> storage.pathTemplate)),
      "batch_started_at" -> batchStartedAtIso,
      "batch_size" -> batchSize)

  /** B8: env-var S3 fallback (batch.py:214-216). */
  def s3FromEnv(env: Map[String, String] = sys.env): Option[S3Config] =
    env.get("LANGCHAIN_S3_BUCKET").map(b => S3Config(bucket = b))
}
