package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Fs

/** Incrementally-maintained clustered table: a z/Hilbert-ordered layout
  * ([[ZOrder]]) that absorbs APPENDS by rewriting only the files whose
  * curve ranges the new rows land in — the `OPTIMIZE ZORDER`-after-
  * ingest maintenance loop of Delta/Iceberg, as one operator.
  *
  * Why not re-run [[ZOrder.write]] per batch: at 100 TB a full
  * re-cluster is a full-table shuffle + rewrite — hours of cluster time
  * to absorb a 0.1% ingest. The steady-state move is bounded-scope
  * compaction: locate the files the new keys interleave into (one
  * broadcast interval probe against the file-level curve ranges), merge-
  * rewrite THOSE with the batch, and leave everything else byte-
  * identical on disk.
  *
  * The curve key is a pure function of the clustering columns under a
  * rank model FROZEN at [[init]] (per-column lo/hi, persisted beside the
  * data). Appends reuse the frozen model — exactly like
  * [[ProductQuantizer]]'s frozen codebooks — so file curve ranges stay
  * comparable forever; rows outside the frozen bounds clamp to the edge
  * cells (tracked per append as `clamped`, this operator's
  * `driftReport`: a climbing clamp rate says re-cluster with fresh
  * bounds, it never says wrong answers).
  *
  * Commit protocol: the LEDGER IS THE MANIFEST, and manifests are
  * VERSIONED, never mutated — `ledger/v=N/`, one immutable snapshot per
  * commit, committed iff its `_SUCCESS` marker exists (Spark's own
  * job-commit marker). Readers ([[read]] / [[readPruned]]) resolve the
  * highest committed version and open exactly the files it lists, so
  * staged data files are invisible until their manifest lands, a crash
  * mid-manifest-write leaves an uncommitted (markerless) version that
  * replay simply overwrites, and there is NO window where the table has
  * no manifest (the failure mode a delete-then-rename swap carries).
  * Replaced data files are retained, which makes every historical
  * version readable ([[read]]`(asOf = Some(n))` — snapshot reads /
  * time travel) until [[vacuum]] drops versions past a retention count
  * and deletes the data files only they reference. This is the
  * delta-log idea reduced to its load-bearing core: immutable manifest
  * versions + marker-gated visibility + retention-bounded vacuum.
  *
  * Exactness: answers never depend on the layout — [[readPruned]]
  * re-applies the predicate after pruning, and `q_cluster_append` pins
  * (init + two appends + box read) against a full-scan DuckDB oracle.
  *
  * Single maintainer, like Delta `OPTIMIZE`: two concurrent [[append]]s
  * could rewrite the same region and lose one update — sequencing
  * appends is the caller's job (a streaming sink's per-batch hook, a
  * scheduled compactor). Concurrent READERS are always safe.
  */
object ClusteredStore {

  final case class AppendStats(
      rewritten: Int, created: Int, untouched: Int, clamped: Long,
      version: Int = 1)

  private def dataDir(dir: String) = s"$dir/data"
  private def ledgerDir(dir: String) = s"$dir/ledger"
  private def versionDir(dir: String, v: Int) = s"$dir/ledger/v=$v"
  private def modelDir(dir: String) = s"$dir/model"

  /** Highest COMMITTED manifest version (has Spark's `_SUCCESS` marker);
    * None before init. Uncommitted (crashed) version dirs are ignored —
    * and overwritten by the retrying writer.
    */
  def currentVersion(spark: SparkSession, dir: String): Option[Int] =
    Fs.list(spark, ledgerDir(dir))
      .map(_.getPath)
      .filter(p => p.getName.startsWith("v="))
      .filter(p => Fs.exists(spark, s"$p/_SUCCESS"))
      .map(_.getName.stripPrefix("v=").toInt)
      .sorted.lastOption

  /** The manifest snapshot at `asOf` (default: current). */
  def manifest(spark: SparkSession, dir: String,
      asOf: Option[Int] = None): DataFrame = {
    val v = asOf.orElse(currentVersion(spark, dir)).getOrElse(
      throw new IllegalStateException(s"no committed manifest under $dir"))
    spark.read.parquet(versionDir(dir, v))
  }

  /** Frozen curve key for `cols` under the (lo, hi) model: ranks scale
    * linearly and CLAMP at the edges, so post-init rows outside the
    * frozen bounds still land in the outermost cells.
    */
  private def curveKey(
      cols: Seq[String], curve: String, lo: Map[String, Double],
      hi: Map[String, Double]): Column = {
    val ranks = array(cols.map { c =>
      val span = hi(c) - lo(c)
      val scaled =
        if (span > 0) round((col(c).cast("double") - lit(lo(c))) / lit(span)
          * 65535.0).cast("int")
        else lit(0)
      coalesce(least(greatest(scaled, lit(0)), lit(65535)), lit(0))
    }: _*)
    val fn = curve match {
      case "morton" => "z_value"
      case "hilbert" => "hilbert_value"
      case other => throw new IllegalArgumentException(
        s"curve must be morton|hilbert, got $other")
    }
    call_function(fn, ranks)
  }

  private def loadModel(spark: SparkSession, dir: String)
      : (Seq[String], String, Map[String, Double], Map[String, Double]) = {
    val m = spark.read.parquet(modelDir(dir)).collect()
    val curve = m.head.getAs[String]("curve")
    val cols = m.map(_.getAs[String]("col")).toSeq.sorted
    val lo = m.map(r => r.getAs[String]("col") -> r.getAs[Double]("lo")).toMap
    val hi = m.map(r => r.getAs[String]("col") -> r.getAs[Double]("hi")).toMap
    // restore clustering order (model rows carry the position)
    val ordered = m.sortBy(_.getAs[Int]("pos")).map(_.getAs[String]("col"))
    (ordered.toSeq, curve, lo, hi)
  }

  private def ledgerRows(
      df: DataFrame, cols: Seq[String], key: Column,
      batchId: Long): DataFrame = {
    val aggs = cols.flatMap(c => Seq(min(col(c)).as(s"min_$c"),
      max(col(c)).as(s"max_$c"))) ++
      Seq(count(lit(1)).as("n_rows"), min(col("_z")).as("z_lo"),
        max(col("_z")).as("z_hi"))
    df.withColumn("_z", key)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("batch_id", lit(batchId))
  }

  /** Create the store: freeze the rank model on `df`'s bounds, write the
    * clustered files, and publish the ledger manifest.
    */
  def init(df: DataFrame, cols: Seq[String], nFiles: Int, dir: String,
      curve: String = "hilbert"): Unit = {
    require(cols.size >= 2 && cols.size <= 4, "clustering wants 2-4 columns")
    val spark = df.sparkSession
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val b = df.agg(
      cols.flatMap(c => Seq(min(col(c).cast("double")).as(s"lo_$c"),
        max(col(c).cast("double")).as(s"hi_$c"))).head,
      cols.flatMap(c => Seq(min(col(c).cast("double")).as(s"lo_$c"),
        max(col(c).cast("double")).as(s"hi_$c"))).tail: _*).head()
    val lo = cols.map(c =>
      c -> (if (b.isNullAt(b.fieldIndex(s"lo_$c"))) 0.0
      else b.getDouble(b.fieldIndex(s"lo_$c")))).toMap
    val hi = cols.map(c =>
      c -> (if (b.isNullAt(b.fieldIndex(s"hi_$c"))) 0.0
      else b.getDouble(b.fieldIndex(s"hi_$c")))).toMap
    import spark.implicits._
    cols.zipWithIndex
      .map { case (c, i) => (c, i, curve, lo(c), hi(c)) }
      .toDF("col", "pos", "curve", "lo", "hi")
      .coalesce(1).write.mode("overwrite").parquet(modelDir(dir))

    val key = curveKey(cols, curve, lo, hi)
    df.withColumn("_z", key)
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions("_z")
      .select(df.columns.map(col).toSeq: _*)
      .write.mode("overwrite").parquet(dataDir(dir))
    ledgerRows(spark.read.parquet(dataDir(dir)), cols, key, batchId = -1L)
      .write.mode("overwrite").parquet(versionDir(dir, 1))
  }

  /** Absorb `incoming`: rewrite only the files whose curve ranges the
    * new keys land in; rows falling in range GAPS (or past either end)
    * become fresh files without touching anything. Returns what moved.
    */
  def append(spark: SparkSession, dir: String, incoming: DataFrame,
      targetRowsPerFile: Long = 0L, batchId: Long = -1L): AppendStats = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val (cols, curve, lo, hi) = loadModel(spark, dir)
    val key = curveKey(cols, curve, lo, hi)
    val v = currentVersion(spark, dir).getOrElse(
      throw new IllegalStateException(s"append before init under $dir"))
    val led = manifest(spark, dir, Some(v))
      .select("file", "z_lo", "z_hi", "n_rows").collect()
    val inc = incoming.withColumn("_z", key).localCheckpoint()

    // drift: rows whose raw values clamped to an edge cell
    val outside = cols.map { c =>
      col(c).cast("double") < lit(lo(c)) || col(c).cast("double") > lit(hi(c))
    }.reduce(_ || _)
    val clamped = inc.filter(outside).count()

    // file-interval probe: ledger is file-count-sized → broadcast range
    // join against the incoming keys; one distinct file list out
    import spark.implicits._
    val intervals = led.map(r =>
      (r.getAs[String]("file"), r.getAs[Long]("z_lo"), r.getAs[Long]("z_hi")))
      .toSeq.toDF("file", "z_lo", "z_hi")
    val touchedFiles = inc
      .join(broadcast(intervals),
        inc("_z") >= intervals("z_lo") && inc("_z") <= intervals("z_hi"),
        "inner")
      .select("file").distinct().collect().map(_.getString(0)).toSet

    val target =
      if (targetRowsPerFile > 0) targetRowsPerFile
      else math.max(1L, led.map(_.getAs[Long]("n_rows")).sum /
        math.max(1, led.length))
    val baseRows =
      if (touchedFiles.isEmpty) inc.limit(0).select(incoming.columns.map(col): _*)
      else spark.read.parquet(touchedFiles.toSeq: _*)
        .select(incoming.columns.map(col).toSeq: _*)
    val merged = baseRows
      .unionByName(inc.select(incoming.columns.map(col).toSeq: _*))
    val nMerged = merged.count()
    val nNew = math.max(1L, (nMerged + target - 1) / target).toInt

    // stage the rewritten region into the live data dir: new part-file
    // names are unique, and ledger readers cannot see them yet
    val staged = merged.withColumn("_z", key)
      .repartitionByRange(nNew, col("_z"))
      .sortWithinPartitions("_z")
      .select(incoming.columns.map(col).toSeq: _*)
    Fs.stagedAppend(staged, None, dataDir(dir))

    // next manifest version: untouched rows as-is + fresh rows for every
    // data file no PRIOR manifest references (= the files just staged;
    // replaced files stay on disk, still referenced by older versions).
    // mode=overwrite clobbers a markerless dir a crashed attempt left.
    val referenced = (1 to v).flatMap { old =>
      if (Fs.exists(spark, s"${versionDir(dir, old)}/_SUCCESS"))
        spark.read.parquet(versionDir(dir, old))
          .select("file").collect().map(_.getString(0))
      else Seq.empty
    }.toSet
    val allFiles = Fs.list(spark, dataDir(dir))
      .map(_.getPath.toString).filter(f =>
        !f.contains("_SUCCESS") && !f.contains("_temporary"))
    val newFiles = allFiles
      .filterNot(f => referenced.exists(k => samePath(k, f)))
    val untouchedLedger = manifest(spark, dir, Some(v))
      .filter(!col("file").isin(touchedFiles.toSeq: _*))
    val newLedger =
      if (newFiles.isEmpty) untouchedLedger
      else untouchedLedger.unionByName(
        ledgerRows(spark.read.parquet(newFiles: _*), cols, key, batchId))
    newLedger.coalesce(1).write.mode("overwrite")
      .parquet(versionDir(dir, v + 1))

    AppendStats(rewritten = touchedFiles.size, created = newFiles.size,
      untouched = led.length - touchedFiles.size, clamped = clamped,
      version = v + 1)
  }

  /** Small-file compaction: merge every manifest file under
    * `minRowsPerFile` (default: half the store's mean file size) into
    * full-size, curve-sorted files, committed as a new manifest version
    * — the maintenance pass that bounds the file-count growth streaming
    * appends trade for. Only small files are read or rewritten; the
    * merged output is re-sorted by curve key and range-split, so each
    * new file is a contiguous curve run (it may SPAN untouched files'
    * ranges across gaps — coarser boxes, same answers, exactly the
    * append path's documented trade). Old versions still reference the
    * replaced files, so snapshots stay readable until [[vacuum]].
    */
  def compact(spark: SparkSession, dir: String,
      minRowsPerFile: Long = 0L): AppendStats = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val (cols, curve, lo, hi) = loadModel(spark, dir)
    val key = curveKey(cols, curve, lo, hi)
    val v = currentVersion(spark, dir).getOrElse(
      throw new IllegalStateException(s"compact before init under $dir"))
    val led = manifest(spark, dir, Some(v)).select("file", "n_rows").collect()
    val mean = math.max(1L,
      led.map(_.getAs[Long]("n_rows")).sum / math.max(1, led.length))
    val floor = if (minRowsPerFile > 0) minRowsPerFile else mean / 2
    val smalls = led.filter(_.getAs[Long]("n_rows") < floor)
      .map(_.getAs[String]("file"))
    if (smalls.length < 2)
      return AppendStats(0, 0, led.length, 0L, version = v)

    val rows = spark.read.parquet(smalls.toSeq: _*)
    val n = rows.count()
    // size outputs at the HEALTHY files' mean (the overall mean is
    // dragged down by the very files being merged), and always emit
    // strictly fewer files than were merged — compaction that breaks
    // even on file count is not compaction
    val healthy = led.filter(_.getAs[Long]("n_rows") >= floor)
      .map(_.getAs[Long]("n_rows"))
    val target = if (healthy.nonEmpty) healthy.sum / healthy.length else mean
    val nNew = math.min(smalls.length - 1,
      math.max(1L, (n + target - 1) / target).toInt)
    val dropCols = rows.columns.toSeq
    Fs.stagedAppend(
      rows.withColumn("_z", key)
        .repartitionByRange(nNew, col("_z"))
        .sortWithinPartitions("_z")
        .select(dropCols.map(col): _*),
      None, dataDir(dir))

    val referenced = (1 to v).flatMap { old =>
      if (Fs.exists(spark, s"${versionDir(dir, old)}/_SUCCESS"))
        spark.read.parquet(versionDir(dir, old))
          .select("file").collect().map(_.getString(0))
      else Seq.empty
    }.toSet
    val allFiles = Fs.list(spark, dataDir(dir))
      .map(_.getPath.toString).filter(f =>
        !f.contains("_SUCCESS") && !f.contains("_temporary"))
    val newFiles = allFiles
      .filterNot(f => referenced.exists(k => samePath(k, f)))
    val untouched = manifest(spark, dir, Some(v))
      .filter(!col("file").isin(smalls.toSeq: _*))
    val newLedger =
      if (newFiles.isEmpty) untouched
      else untouched.unionByName(
        ledgerRows(spark.read.parquet(newFiles: _*), cols, key,
          batchId = -1L))
    newLedger.coalesce(1).write.mode("overwrite")
      .parquet(versionDir(dir, v + 1))
    AppendStats(rewritten = smalls.length, created = newFiles.size,
      untouched = led.length - smalls.length, clamped = 0L,
      version = v + 1)
  }

  /** Drop manifest versions past the newest `keepLast` and delete the
    * data files ONLY dropped versions reference — bounded-retention
    * time travel. Keeps at least the current version.
    */
  def vacuum(spark: SparkSession, dir: String, keepLast: Int = 1): Int = {
    require(keepLast >= 1, "must keep at least the current version")
    val committed = Fs.list(spark, ledgerDir(dir))
      .map(_.getPath.getName).filter(_.startsWith("v="))
      .map(_.stripPrefix("v=").toInt)
      .filter(n => Fs.exists(spark, s"${versionDir(dir, n)}/_SUCCESS"))
      .sorted
    val (drop, keep) = committed.splitAt(math.max(0, committed.size - keepLast))
    if (drop.isEmpty) return 0
    def filesOf(vs: Seq[Int]): Set[String] = vs.flatMap(n =>
      spark.read.parquet(versionDir(dir, n))
        .select("file").collect().map(_.getString(0))).toSet
    val doomed = filesOf(drop) -- filesOf(keep)
    doomed.foreach(f => Fs.delete(spark, f))
    drop.foreach(n => Fs.delete(spark, versionDir(dir, n)))
    doomed.size
  }

  /** [[append]] as an exactly-once `foreachBatch` hook: the batch id is
    * stamped on the ledger rows the append creates, and since the ledger
    * swap IS the append's commit point, "this batch's id already appears
    * in the ledger" is a transactional replay probe — no separate marker
    * whose write could race the commit. Structured Streaming re-delivers
    * only the LAST uncommitted batch after a crash, and a just-appended
    * batch's rows are still in the ledger at that moment (later batches
    * haven't run, so nothing rewrote its files), so the probe is exact
    * where replays can actually happen. Single maintainer per store, as
    * [[append]] documents — one stream, or a coordinated compactor.
    */
  def appendStream(spark: SparkSession, dir: String, batch: DataFrame,
      batchId: Long): AppendStats = {
    require(batchId >= 0, "streaming batch ids are non-negative")
    val cur = manifest(spark, dir)
    val replayed =
      cur.filter(col("batch_id") === batchId).limit(1).count() > 0
    if (replayed)
      AppendStats(rewritten = 0, created = 0,
        untouched = cur.count().toInt, clamped = 0L,
        version = currentVersion(spark, dir).getOrElse(1))
    else append(spark, dir, batch, batchId = batchId)
  }

  /** Hadoop path equality across `file:/` vs `file:///` spellings. */
  private def samePath(a: String, b: String): Boolean =
    new org.apache.hadoop.fs.Path(a).toUri.getPath ==
      new org.apache.hadoop.fs.Path(b).toUri.getPath

  /** Every live row of the snapshot — exactly the files its manifest
    * lists (`asOf` = a committed version for time travel; default
    * current).
    */
  def read(spark: SparkSession, dir: String,
      asOf: Option[Int] = None): DataFrame = {
    val files = manifest(spark, dir, asOf)
      .select("file").collect().map(_.getString(0))
    if (files.isEmpty)
      spark.read.parquet(dataDir(dir)).where(lit(false))
    else spark.read.parquet(files.toSeq: _*)
  }

  /** Ledger-pruned box read; predicate re-applied → full-scan answers. */
  def readPruned(spark: SparkSession, dir: String,
      boxes: Seq[StatsLedger.Box], asOf: Option[Int] = None): DataFrame = {
    val exact = boxes.map { b =>
      val loP = b.lo.map(v => col(b.col) >= lit(v)).getOrElse(lit(true))
      val hiP = b.hi.map(v => col(b.col) <= lit(v)).getOrElse(lit(true))
      loP && hiP
    }.reduceOption(_ && _).getOrElse(lit(true))
    val v = asOf.orElse(currentVersion(spark, dir)).getOrElse(
      throw new IllegalStateException(s"no committed manifest under $dir"))
    val files = StatsLedger.pruneFiles(spark, versionDir(dir, v), boxes)
    if (files.isEmpty) read(spark, dir, asOf).where(lit(false))
    else spark.read.parquet(files: _*).filter(exact)
  }
}
