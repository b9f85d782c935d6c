package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Fs

/** Merge-on-read deletion vectors ([[ClusteredStore.deleteKeysDV]]):
  * point takedowns priced as ONE manifest commit — zero data files
  * rewritten — with the mask applied on every read path and folded
  * into clean files whenever a rewrite touches the masked file. The
  * write-amplification contrast with copy-on-write is measured here
  * (bytes rewritten per takedown) and recorded in SCALE.md.
  */
class DeletionVectorSpec extends SparkSpec {
  import spark.implicits._

  private def mkDocs(ids: Range) =
    ids.toDF("id")
      .withColumn("key", col("id").cast("long"))
      .withColumn("a", col("id").cast("long") * 7919 % 1000)
      .withColumn("b", col("id").cast("long") * 104729 % 1000)
      .withColumn("payload", concat(lit("row"), col("id")))

  private def dataFiles(dir: String): Map[String, Long] =
    Fs.list(spark, s"$dir/data")
      .filterNot(s => s.getPath.getName.startsWith("_") ||
        s.getPath.getName.startsWith("."))
      .map(s => s.getPath.getName -> s.getLen).toMap

  test("a 2-key takedown rewrites ZERO data files: the data dir is " +
    "byte-identical, all three read paths mask the keys, and time " +
    "travel still serves them") {
    val dir = java.nio.file.Files.createTempDirectory("dv1").toString
    ClusteredStore.init(mkDocs(0 until 4000), Seq("a", "b"), 6, dir,
      bloomCols = Seq("key"))
    val before = dataFiles(dir)

    val st = ClusteredStore.deleteKeysDV(spark, dir, "key",
      Seq(123L, 3456L))
    assert(st.rewritten === 0 && st.deleted === 2L && st.version === 2)
    assert(dataFiles(dir) === before,
      "a DV takedown must not touch a single data file")

    val snap = ClusteredStore.read(spark, dir)
    assert(snap.count() === 3998L)
    assert(snap.filter(col("key").isin(123L, 3456L)).count() === 0L)
    // Bloom point lookup honors the mask
    assert(ClusteredStore.readPoint(spark, dir, "key",
      Seq(123L, 3456L)).count() === 0L)
    assert(ClusteredStore.readPoint(spark, dir, "key",
      Seq(124L)).count() === 1L)
    // pruned box read honors the mask
    val pruned = ClusteredStore.readPruned(spark, dir,
      Seq(StatsLedger.Box.between("a", 0L, 999L)))
    assert(pruned.count() === 3998L)
    // the audit trail: v1 still shows the masked rows
    assert(ClusteredStore.read(spark, dir, asOf = Some(1))
      .filter(col("key").isin(123L, 3456L)).count() === 2L)
    // live-row accounting
    assert(ClusteredStore.stats(spark, dir).nRows === 3998L)
  }

  test("repeated takedowns on one file MERGE their key lists and " +
    "never double-count; interleaved takedowns on TWO key domains " +
    "need no manual compact — the cross-column hit files fold " +
    "copy-on-write inside the same commit") {
    val dir = java.nio.file.Files.createTempDirectory("dv2").toString
    ClusteredStore.init(mkDocs(0 until 2000), Seq("a", "b"), 2, dir,
      bloomCols = Seq("key"))
    assert(ClusteredStore.deleteKeysDV(spark, dir, "key",
      Seq(10L, 11L)).deleted === 2L)
    // overlapping re-delete: 11 is already masked, only 12 is live
    assert(ClusteredStore.deleteKeysDV(spark, dir, "key",
      Seq(11L, 12L)).deleted === 1L)
    assert(ClusteredStore.read(spark, dir).count() === 1997L)
    assert(ClusteredStore.stats(spark, dir).nRows === 1997L)
    // a fully-masked re-delete is a no-op: no empty commit
    val v = ClusteredStore.currentVersion(spark, dir).get
    assert(ClusteredStore.deleteKeysDV(spark, dir, "key",
      Seq(10L, 12L)).version === v)

    // SECOND KEY DOMAIN (r11 verdict: real compliance pipelines have
    // at least two — doc ids AND user ids). First spread the
    // key-domain mask across EVERY file (precondition asserted below),
    // so the id-domain takedown is GUARANTEED to hit files already
    // masked on `key` — those fold copy-on-write in the same commit
    // (the old mask disposes physically, the new keys drop
    // physically); one-commit atomic, no manual compact ever ran.
    val spread = (0L until 2000L by 7).filterNot(Seq(10L, 11L, 12L).contains)
    ClusteredStore.deleteKeysDV(spark, dir, "key", spread)
    val preMan = ClusteredStore.manifest(spark, dir)
    assert(preMan.filter(col("dv_keys").isNotNull &&
      size(col("dv_keys")) > 0).count() === preMan.count(),
      "precondition: every file must carry a key-domain mask")
    val liveBefore = ClusteredStore.read(spark, dir).count()

    // ids 13 and 15 are live (not multiples of 7, not masked above)
    val st = ClusteredStore.deleteKeysDV(spark, dir, "id", Seq(13L, 15L))
    assert(st.deleted === 2L && st.rewritten > 0,
      "cross-column hits must FOLD (rewrite), not refuse")
    val snap = ClusteredStore.read(spark, dir)
    assert(snap.count() === liveBefore - 2)
    assert(snap.filter(col("id").isin(13, 15)).count() === 0L)
    assert(snap.filter(col("key").isin(10L, 11L, 12L)).count() === 0L,
      "the fold must not resurrect the first domain's masked rows")
    assert(ClusteredStore.stats(spark, dir).nRows === liveBefore - 2)
    // every id-hit file was key-masked → folded physically: no id-mask
    // row may exist, and no file ever carries two mask columns
    val man = ClusteredStore.manifest(spark, dir)
    assert(man.filter(col("dv_col") === "id").count() === 0L,
      "cross-column hits fold physically — never a second mask column")
    // audit trail: the pre-fold snapshot still shows 13/15 live
    assert(ClusteredStore.read(spark, dir, asOf = Some(v))
      .filter(col("id").isin(13, 15)).count() === 2L)
  }

  test("masks FOLD on rewrite: an append touching a masked file drops " +
    "the masked rows physically, clears the mask, and a re-appended " +
    "key SURVIVES (file-scoped, point-in-time deletion)") {
    val dir = java.nio.file.Files.createTempDirectory("dv3").toString
    // 2 files so the append's curve probe touches them broadly
    ClusteredStore.init(mkDocs(0 until 2000), Seq("a", "b"), 2, dir,
      bloomCols = Seq("key"))
    ClusteredStore.deleteKeysDV(spark, dir, "key", Seq(100L, 200L, 300L))
    assert(ClusteredStore.read(spark, dir).count() === 1997L)

    // re-add key=100 with a recognizable payload, plus fresh rows that
    // interleave into the masked files' curve ranges (same id domain)
    val re = mkDocs(100 until 101)
      .withColumn("payload", lit("reborn"))
      .unionByName(mkDocs(10000 until 10040))
    val st = ClusteredStore.append(spark, dir, re)
    assert(st.rewritten > 0, "the append must touch the masked files")

    val snap = ClusteredStore.read(spark, dir)
    assert(snap.filter(col("key") === 100L).count() === 1L)
    assert(snap.filter(col("payload") === "reborn").count() === 1L,
      "the NEW row with a masked key must survive — deletion is " +
        "point-in-time, not a forever-ban on the key")
    assert(snap.filter(col("key").isin(200L, 300L)).count() === 0L)
    assert(snap.count() === 1997L + 41L)

    // rewritten files carry no mask; the fold was physical for them
    val man = ClusteredStore.manifest(spark, dir)
    val masked = man.filter(col("dv_keys").isNotNull &&
      size(col("dv_keys")) > 0)
    masked.select("file").collect().map(_.getString(0)).foreach { f =>
      assert(ClusteredStore.manifest(spark, dir, Some(3))
        .columns.contains("dv_keys"))
    }
    // whatever is still masked must be on UNTOUCHED files only — and a
    // raw parquet read of any REWRITTEN file contains no masked key
    val files = man.select("file").collect().map(_.getString(0))
    val rewritten = files.filterNot(
      ClusteredStore.manifest(spark, dir, Some(2))
        .select("file").collect().map(_.getString(0)).toSet)
    if (rewritten.nonEmpty) {
      val raw = spark.read.parquet(rewritten.toSeq: _*)
      assert(raw.filter(col("key").isin(200L, 300L)).count() === 0L,
        "masked rows leaked into a rewritten (folded) file")
    }
  }

  test("compact folds mostly-dead files on its own: after folding, " +
    "manifests are clean of the mask and the bytes are really gone") {
    val dir = java.nio.file.Files.createTempDirectory("dv4").toString
    ClusteredStore.init(mkDocs(0 until 3000), Seq("a", "b"), 3, dir,
      bloomCols = Seq("key"))
    // mask ~60% of every file: all three become mostly-dead
    val doomed = (0L until 3000L).filter(_ % 5 != 0)
    ClusteredStore.deleteKeysDV(spark, dir, "key", doomed)
    assert(ClusteredStore.read(spark, dir).count() === 600L)
    assert(ClusteredStore.stats(spark, dir).nRows === 600L)

    val st = ClusteredStore.compact(spark, dir)
    assert(st.rewritten === 3, "all mostly-dead files must fold")
    val man = ClusteredStore.manifest(spark, dir)
    if (man.columns.contains("dv_keys"))
      assert(man.filter(col("dv_keys").isNotNull &&
        size(col("dv_keys")) > 0).count() === 0L,
        "folded files must carry no mask")
    assert(ClusteredStore.read(spark, dir).count() === 600L)
    // physical: the current files, read RAW, hold only live rows
    val files = man.select("file").collect().map(_.getString(0)).toSeq
    assert(spark.read.parquet(files: _*).count() === 600L)
    // vacuum retires the pre-fold files — actual disposal
    ClusteredStore.vacuum(spark, dir, keepLast = 1)
    val onDisk = dataFiles(dir).keySet
    assert(onDisk === files.map(f =>
      new org.apache.hadoop.fs.Path(f).getName).toSet)
  }

  test("write amplification, measured: the same 2-key takedown costs " +
    "a full-file rewrite under copy-on-write and ZERO rewritten bytes " +
    "under deletion vectors") {
    val cowDir = java.nio.file.Files.createTempDirectory("dvcow").toString
    val dvDir = java.nio.file.Files.createTempDirectory("dvmor").toString
    val docs = mkDocs(0 until 50000)
    ClusteredStore.init(docs, Seq("a", "b"), 4, cowDir,
      bloomCols = Seq("key"))
    ClusteredStore.init(docs, Seq("a", "b"), 4, dvDir,
      bloomCols = Seq("key"))
    val keys = Seq(777L, 33333L)

    val cowBefore = dataFiles(cowDir)
    val cowStats = ClusteredStore.deleteKeys(spark, cowDir, "key", keys)
    val cowAfter = dataFiles(cowDir)
    val rewrittenBytes = cowAfter.filterNot { case (n, _) =>
      cowBefore.contains(n) }.values.sum

    val dvBefore = dataFiles(dvDir)
    val dvStats = ClusteredStore.deleteKeysDV(spark, dvDir, "key", keys)
    assert(dataFiles(dvDir) === dvBefore)

    assert(cowStats.deleted === 2L && dvStats.deleted === 2L)
    assert(cowStats.rewritten >= 1 && dvStats.rewritten === 0)
    assert(rewrittenBytes > 0L)
    // identical answers
    val a = ClusteredStore.read(spark, cowDir).orderBy("id")
      .collect().toSeq
    val b = ClusteredStore.read(spark, dvDir)
      .select(ClusteredStore.read(spark, cowDir).columns.map(col): _*)
      .orderBy("id").collect().toSeq
    assert(a === b)
    info(f"2-key takedown in 50k rows: CoW rewrote " +
      f"${cowStats.rewritten} files / $rewrittenBytes%,d bytes; " +
      f"DV rewrote 0 files / 0 bytes (one manifest commit)")
  }
}
