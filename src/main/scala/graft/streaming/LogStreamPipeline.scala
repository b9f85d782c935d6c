package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.core.{Fs, LogEntry}
import graft.query.{LogRollup, ShreddedLog}

/** The full streaming ingest tick: land the micro-batch in the
  * date-partitioned log, shred it into the typed store, fold it into
  * the dashboard rollup — THREE stores maintained by ONE exactly-once
  * `foreachBatch` hook.
  *
  * Before this, the sink streamed ([[graft.sink.StreamingLogWriter]])
  * but [[ShreddedLog]] and [[LogRollup]] were maintained by explicit
  * `appendNew` calls — a second scheduler to operate, and a file-diff
  * whose idempotence key (source-file fingerprint) cannot survive
  * streaming replay (a re-delivered batch re-lands under fresh
  * part-file names, so its rows would fingerprint as new). Here every
  * stage keys on the one identity Structured Streaming guarantees
  * stable across crash/replay: the batch id.
  *
  * Exactly-once WITHOUT a cross-store transaction: each stage's write
  * is a dynamic partition overwrite keyed by the batch —
  * `date=/batch=<id>` for the landed log, `date=/src=batch-<id>` for
  * shred and rollup — so each stage REPLACES ITSELF on replay. A crash
  * anywhere inside the tick re-delivers the whole batch; stages that
  * ran are overwritten byte-equivalently, stages that didn't run now
  * do. No stage can double-count, no stage can be skipped.
  * (tests/test_batch.py:72-84 is the reference's write-then-read-back
  * discipline this generalizes; the landed `date=` layout matches
  * SURVEY §2.1 S1 with one extra `batch=` partition level.)
  *
  * Consistency: a dashboard read between stages of a tick sees the
  * rollup lag the log by at most one micro-batch — the same staleness
  * any asynchronously-maintained aggregate store carries. To PIN one
  * snapshot across all three stores, [[readConsistent]] serves every
  * store filtered to `batch <= id` — the batch-keyed layouts make the
  * cross-store cut a partition filter, no extra bookkeeping.
  *
  * Torn-read caveat (direct log readers): each stage commits via
  * Spark's job commit, not a directory-level transaction — between a
  * crashed attempt and its replay, a RAW reader of `logDir` (a
  * `date=`/`batch=` wildcard glob that ignores job markers) can observe a
  * partially-committed batch, and during a compaction fold it can
  * briefly double-count a folded batch (new generation renamed in,
  * source dirs not yet deleted). Both windows close on replay/resume;
  * readers that must never see them should read through
  * [[readConsistent]] with `batchId` = the last COMPLETED tick, which
  * excludes the in-flight batch by key. This is the same at-least-once
  * visibility contract every marker-less object-store landing zone
  * carries.
  *
  * Scale shape: every stage is one map-side pass over the micro-batch
  * (the rollup's groupBy is partial-agg dominated at micro-batch size);
  * the batch is persisted once and scanned three times in memory, never
  * recomputed from the source. At 100 TB/day the unit of retry stays
  * one micro-batch, and the landed `batch=` dirs are folded into
  * bounded compacted GENERATIONS every `compactEvery` ticks inside the
  * same exactly-once discipline (see [[compactLanded]]) — no separate
  * compaction scheduler to operate (the r9 critique of shred/rollup,
  * closed for the log dir too).
  */
object LogStreamPipeline {

  private val BatchDirRe = "^batch=([0-9]+)$".r
  private val GenDirRe = "^batch=([0-9]+)c$".r

  private def dateDirs(spark: SparkSession, logDir: String) =
    Fs.list(spark, logDir)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("date="))

  /** Highest batch id folded into a compacted generation, across all
    * date partitions (−1 when none): a `batch=<N>c` generation holds
    * every batch `<= N−1` that existed at fold time, so ids at or below
    * this are NO LONGER individually addressable in the log — a replay
    * of one would resurrect rows a generation already absorbed
    * ([[tick]] guards on exactly this), and [[readConsistent]] cannot
    * pin below it. Derived from the directory names alone — the
    * evidence survives any crash point, unlike a separately-written
    * watermark file that could lag the fold.
    */
  def maxFolded(spark: SparkSession, logDir: String): Long =
    dateDirs(spark, logDir)
      .flatMap(d => Fs.list(spark, d.getPath.toString)
        .map(_.getPath.getName).collect {
          case GenDirRe(m) => m.toLong - 1
        })
      .foldLeft(-1L)(math.max)

  /** Test hook: invoked after a generation commits (rename) and before
    * its sources are deleted — the crash point the resume path exists
    * for. Production value is a no-op.
    */
  private[streaming] var onGenerationCommit: () => Unit = () => ()

  /** Fold every landed `batch=B` dir with `B <= batchId − 1` — plus any
    * older compacted generation — into ONE new generation
    * `batch=<batchId>c` per date partition, then delete the folded
    * sources. Only batches the stream can never re-deliver are eligible
    * (Structured Streaming replays at most the latest uncommitted
    * batch), so a fold never races a landing.
    *
    * Crash-safe by construction, keyed on the SAME batch id as every
    * other stage: the new generation is written to a hidden temp dir
    * and atomically renamed into place, so it is either absent or
    * complete; a replay that finds its generation already present skips
    * the rewrite and resumes the source deletes (their rows are
    * guaranteed inside the committed generation — sources only shrink
    * between attempts, and the replayed batch itself is never
    * eligible). A crash before the rename leaves invisible temp trash,
    * cleared at the next fold. Between the rename and the last source
    * delete, RAW globs double-count the folded batches — the documented
    * torn window; [[readConsistent]] readers never see it.
    */
  def compactLanded(spark: SparkSession, logDir: String, batchId: Long,
      targetFileBytes: Long = 128L * 1024 * 1024): Unit = {
    dateDirs(spark, logDir).foreach { d =>
      val dPath = d.getPath.toString
      Fs.list(spark, dPath)
        .filter(_.getPath.getName.startsWith(".cmp-tmp-"))
        .foreach(t => Fs.delete(spark, t.getPath.toString))
      val sources = Fs.list(spark, dPath).map(_.getPath.getName).filter {
        case BatchDirRe(b) => b.toLong <= batchId - 1
        case GenDirRe(m) => m.toLong < batchId
        case _ => false
      }
      val dest = s"$dPath/batch=${batchId}c"
      if (Fs.exists(spark, dest)) {
        // a previous attempt committed this generation — resume the
        // source deletes; every remaining source's rows are inside it
        sources.foreach(s0 => Fs.delete(spark, s"$dPath/$s0"))
      } else if (sources.nonEmpty &&
          !(sources.size == 1 && GenDirRe.matches(sources.head))) {
        val bytes = sources.map(s0 =>
          Fs.list(spark, s"$dPath/$s0").map(_.getLen).sum).sum
        val n = math.max(1,
          math.ceil(bytes.toDouble / targetFileBytes).toInt)
        val tmp = s"$dPath/.cmp-tmp-${java.util.UUID.randomUUID}"
        spark.read.parquet(sources.map(s0 => s"$dPath/$s0"): _*)
          .coalesce(n)
          .write.mode("overwrite").option("compression", "snappy")
          .parquet(tmp)
        val fs = Fs(spark, dPath)
        require(fs.rename(new org.apache.hadoop.fs.Path(tmp),
            new org.apache.hadoop.fs.Path(dest)),
          s"generation commit rename failed: $tmp -> $dest")
        onGenerationCommit()
        sources.foreach(s0 => Fs.delete(spark, s"$dPath/$s0"))
      }
    }
  }

  /** Stage 1: land the micro-batch in the log. Idempotent: a replayed
    * batch dynamically overwrites exactly its own `date=/batch=`
    * partitions — including partial files from a crashed attempt.
    */
  def land(batch: DataFrame, batchId: Long, logDir: String): Unit =
    batch
      .withColumn("date", to_date(col("timestamp")))
      .withColumn("batch", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("date", "batch")
      .option("compression", "snappy")
      .parquet(logDir)

  private val SrcBatchRe = "^src=batch-([0-9]+)$".r
  private val SrcGenRe = "^src=gen-([0-9]+)c$".r

  /** The [[compactLanded]] discipline applied to a `date=/src=`
    * batch-keyed store (shred, rollup): fold every `src=batch-<k>`
    * partition with `k <= batchId − 1` — plus older `src=gen-<M>c`
    * generations — into one new generation `src=gen-<batchId>c` per
    * date partition. Without this, the downstream stores accumulate
    * one partition per micro-batch forever — the exact critique the
    * landed log's fold answered, one level down. `merge` is the
    * store's fold algebra: identity for the full-fidelity shred rows;
    * the partial-state merge for the rollup (so folding also COLLAPSES
    * partial rows, not just files). Same crash discipline: temp write,
    * atomic rename (generation absent-or-complete), replay that finds
    * its generation resumes the source deletes.
    */
  private def foldSrcStore(spark: SparkSession, storeDir: String,
      batchId: Long, targetFileBytes: Long,
      merge: DataFrame => DataFrame): Unit = {
    dateDirs(spark, storeDir).foreach { d =>
      val dPath = d.getPath.toString
      Fs.list(spark, dPath)
        .filter(_.getPath.getName.startsWith(".fold-tmp-"))
        .foreach(t => Fs.delete(spark, t.getPath.toString))
      val sources = Fs.list(spark, dPath).map(_.getPath.getName).filter {
        case SrcBatchRe(b) => b.toLong <= batchId - 1
        case SrcGenRe(m) => m.toLong < batchId
        case _ => false
      }
      val dest = s"$dPath/src=gen-${batchId}c"
      if (Fs.exists(spark, dest)) {
        sources.foreach(s0 => Fs.delete(spark, s"$dPath/$s0"))
      } else if (sources.nonEmpty &&
          !(sources.size == 1 && SrcGenRe.matches(sources.head))) {
        val bytes = sources.map(s0 =>
          Fs.list(spark, s"$dPath/$s0").map(_.getLen).sum).sum
        val n = math.max(1,
          math.ceil(bytes.toDouble / targetFileBytes).toInt)
        val tmp = s"$dPath/.fold-tmp-${java.util.UUID.randomUUID}"
        merge(spark.read.parquet(sources.map(s0 => s"$dPath/$s0"): _*))
          .coalesce(n)
          .write.mode("overwrite").option("compression", "snappy")
          .parquet(tmp)
        val fs = Fs(spark, dPath)
        require(fs.rename(new org.apache.hadoop.fs.Path(tmp),
            new org.apache.hadoop.fs.Path(dest)),
          s"fold commit rename failed: $tmp -> $dest")
        sources.foreach(s0 => Fs.delete(spark, s"$dPath/$s0"))
      }
    }
  }

  /** One full ingest tick: land → shred → rollup, each stage
    * batch-keyed idempotent (see class doc), plus — every
    * `compactEvery` ticks (0 = off) — the landed-dir fold
    * ([[compactLanded]]) AND the shred/rollup `src=` partition folds
    * ([[foldSrcStore]]; the rollup fold also merges partial rows down
    * to one per (date, model)), all inside the same replay discipline.
    * The log fold runs FIRST, so the log's fold horizon is always at
    * or ahead of the stores' — the single horizon [[readConsistent]]
    * gates on. Attach as the `foreachBatch` body of any
    * envelope-schema stream, or use the [[StreamingLogPipeline]]
    * wrapper.
    *
    * Stale-replay guard: a batch id at or below [[maxFolded]] is a
    * late replay of a batch some generation already absorbed —
    * re-landing it would resurrect its `batch=` dirs NEXT TO the
    * generation holding its rows (permanent double count). The whole
    * tick is skipped: shred/rollup would only overwrite themselves
    * with identical content anyway.
    */
  def tick(batch: DataFrame, batchId: Long, logDir: String,
      shredDir: String, rollupDir: String, compactEvery: Int = 0,
      targetFileBytes: Long = 128L * 1024 * 1024): Unit = {
    val spark = batch.sparkSession
    if (batchId <= maxFolded(spark, logDir)) return
    val b = batch.persist()
    try {
      land(b, batchId, logDir)
      ShreddedLog.appendBatch(b, batchId, shredDir)
      LogRollup.appendBatch(b, batchId, rollupDir)
    } finally { b.unpersist(); () }
    if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0) {
      compactLanded(spark, logDir, batchId, targetFileBytes)
      foldSrcStore(spark, shredDir, batchId, targetFileBytes, identity)
      foldSrcStore(spark, rollupDir, batchId, targetFileBytes,
        LogRollup.mergePartials)
    }
  }

  /** One pinned snapshot across all three stores: the landed log, the
    * shred store, and the rollup, each restricted to `batch <= batchId`
    * — so a dashboard can read log detail and rollup aggregates that
    * AGREE even while a later tick is mid-flight or being replayed
    * (the stores are mutually consistent only at tick boundaries;
    * this view nails one boundary). Pure partition filtering on the
    * batch-keyed layouts; no extra state is written anywhere.
    *
    * `batchId` must be at least [[maxFolded]] — older batches are
    * folded into compacted generations and no longer individually
    * addressable (the same horizon a vacuumed store's time travel has).
    */
  final case class ConsistentView(
      log: DataFrame, shred: DataFrame, rollup: DataFrame)

  def readConsistent(spark: SparkSession, batchId: Long, logDir: String,
      shredDir: String, rollupDir: String,
      grain: Seq[String] = Seq("model")): ConsistentView = {
    val folded = maxFolded(spark, logDir)
    require(batchId >= folded,
      s"batches <= $folded are folded into compacted generations — " +
        s"the log cannot serve a snapshot at $batchId anymore")
    val raw = spark.read.option("basePath", logDir).parquet(logDir)
    // generation dirs read as non-numeric `batch` values; they hold
    // only batches <= maxFolded <= batchId, so they pass whole
    val b = col("batch").cast("string")
    val log = raw.filter(!b.rlike("^[0-9]+$") ||
      b.cast("long") <= batchId)
    ConsistentView(
      log,
      ShreddedLog.readAsOf(spark, shredDir, batchId),
      LogRollup.read(spark, rollupDir, grain, upToBatch = Some(batchId)))
  }
}

/** [[graft.sink.StreamingLogWriter]] upgraded to the full pipeline: the
  * same in-memory `LogEntry` source and drain semantics, with the
  * `foreachBatch` hook driving [[LogStreamPipeline.tick]] so the typed
  * shred store and the dashboard rollup stay current with the log —
  * one checkpointed stream, three exactly-once stores.
  */
final class StreamingLogPipeline(
    spark: SparkSession,
    logDir: String,
    shredDir: String,
    rollupDir: String,
    checkpointDir: String,
    triggerInterval: String = "1 second",
    compactEvery: Int = 0) {

  import spark.implicits._

  private val source =
    MemoryStream(implicitly[org.apache.spark.sql.Encoder[LogEntry]], spark)

  private var query: StreamingQuery = _

  def start(): this.type = {
    query = source.toDF()
      .writeStream
      .trigger(Trigger.ProcessingTime(triggerInterval))
      .option("checkpointLocation", checkpointDir)
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            id: Long) =>
          LogStreamPipeline.tick(batch, id, logDir, shredDir, rollupDir,
            compactEvery)
      }
      .start()
    this
  }

  def log(entries: LogEntry*): Unit = source.addData(entries)

  /** Synchronously process everything logged so far (test/drain hook). */
  def processAllAvailable(): Unit = query.processAllAvailable()

  def stop(): Unit = {
    if (query != null) {
      query.processAllAvailable() // don't drop the tail buffer
      query.stop()
    }
  }
}
