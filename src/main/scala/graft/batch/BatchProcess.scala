package graft.batch

import java.time.Instant

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core._
import graft.ingest.ParquetLogger
import graft.sink.ParquetDirSink

/** The high-level batch driver (reference `batch_process`,
  * batch.py:135-294): validate → resolve paths → enrich metadata → run the
  * bounded-concurrency map with callback logging → land results and the
  * event log.
  *
  * Scale design: the reference funnels every callback into one in-process
  * buffer. Across executors that's impossible, so each row's events are
  * captured executor-side ([[CollectingSink]]), travel with the result
  * rows, and are exploded + written once as a date-partitioned parquet log
  * — one distributed write instead of N executor-local files, and the
  * result Dataset never passes through the driver unless
  * `returnResults=true`.
  */
object BatchProcess {

  final case class RowOutcome(
      index: Long,
      prompt: String,
      ok: Boolean,
      result: String,
      error: String,
      events: Seq[LogEntry])

  final case class BatchOutput(
      results: Option[Array[RowOutcome]],
      logDir: String,
      processed: Long)

  def run(
      spark: SparkSession,
      df: DataFrame,
      llm: LlmConfig,
      transport: (String, Map[String, Any]) => String,
      job: JobConfig = JobConfig(),
      processing: ProcessingConfig = ProcessingConfig(),
      storage: StorageConfig = StorageConfig(),
      columns: ColumnConfig = ColumnConfig(),
      clock: Clock = SystemClock,
      env: Map[String, String] = sys.env,
      knownSize: Option[Long] = None): BatchOutput = {
    import spark.implicits._

    // B5: validation
    BatchRunner.validateColumns(df, columns)

    // B6/B8: resolved log path (+ env S3 fallback recorded in metadata)
    val date = Instant.ofEpochSecond(clock.nowMicros / 1000000)
      .toString.take(10)
    val resolved = BatchRunner.resolvePath(storage.pathTemplate, job, date)
    val logDir = s"${storage.logDir.stripSuffix("/")}/$resolved"
    val s3 = storage.s3.orElse(BatchRunner.s3FromEnv(env))

    // B7: metadata enrichment. The batch size rides into every logged
    // event's metadata, so it must be known BEFORE the run; callers that
    // already know their corpus size (an upstream count, a manifest row
    // count) pass it through and save a full extra scan of the input.
    val batchSize = knownSize.getOrElse(df.count())
    val metadata = BatchRunner.loggerMetadata(job, processing, storage,
      Instant.ofEpochSecond(clock.nowMicros / 1000000).toString, batchSize) ++
      s3.map(c => "s3_bucket" -> c.bucket).toMap

    // B1/B2/B3: bounded-concurrency map with executor-side event capture
    val eventTypes = EventType.Default
    val prompts = df.select(col(columns.promptColumn).cast("string"))
      .as[String]
    // The error is caught INSIDE the capture boundary: a failed call must
    // still deliver its llm_start/llm_error events with the row (B3 +
    // A10-style capture; a thrown exception would discard the sink).
    val outcomes = BatchRunner.batchRun[String, (Boolean, String, String, Seq[LogEntry])](
      prompts,
      { prompt =>
        val sink = new CollectingSink
        val logger = new ParquetLogger(sink, eventTypes, metadata, clock)
        val client = llm.createLlm(transport, Seq(logger))
        try {
          val out = client.invoke(prompt)
          (true, out, "", sink.entries.toVector)
        } catch {
          case e: Throwable if processing.returnExceptions =>
            (false, "", s"${e.getClass.getSimpleName}: ${e.getMessage}",
              sink.entries.toVector)
        }
      },
      maxConcurrency = processing.maxConcurrency,
      returnExceptions = processing.returnExceptions)

    val rows: Dataset[RowOutcome] = outcomes.map { r =>
      val (ok, result, error, events) =
        r.value.getOrElse((false, "", r.error.getOrElse(""), Seq.empty[LogEntry]))
      RowOutcome(r.index, "", ok, result, error, events)
    }

    // land the event log once, columnar, date-partitioned — the entries
    // stay distributed end to end
    val persisted = rows.persist()
    val entries = persisted.flatMap(_.events)
    new ParquetDirSink(spark, logDir).writeDataset(entries.toDF())

    val results =
      if (processing.returnResults) Some(persisted.collect()) else None
    val processed = persisted.count()
    persisted.unpersist()
    BatchOutput(results, logDir, processed)
  }
}
