package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Fs
import graft.ops.StatsLedger.Box

/** Incremental clustered maintenance: appends land exactly, rewrite
  * scope stays bounded to the touched curve region, untouched files
  * stay byte-identical, the manifest protocol hides staged files, and
  * drift clamping is counted, not silently absorbed.
  */
class ClusteredStoreSpec extends SparkSpec {
  import spark.implicits._

  private def mkDocs(ids: Range) =
    ids.toDF("id")
      .withColumn("a", col("id") * 7919 % 1000)
      .withColumn("b", col("id") * 104729 % 1000)
      .withColumn("payload", concat(lit("row"), col("id")))

  test("append merges exactly; only the touched region is rewritten and " +
    "untouched files keep their paths and contents") {
    val dir = java.nio.file.Files.createTempDirectory("clstore").toString
    val base = mkDocs(0 until 20000)
    ClusteredStore.init(base, Seq("a", "b"), 16, dir)

    def dataFiles() = Fs.list(spark, s"$dir/data")
      .filterNot(_.getPath.getName.startsWith("_")) // _SUCCESS marker
      .map(s => s.getPath.getName -> (s.getLen, s.getModificationTime)).toMap
    val before = dataFiles()

    // a NARROW append: 300 rows confined to one corner of rank space
    val delta = (100000 until 100300).toDF("id")
      .withColumn("a", col("id") % 40)      // a in [0, 40)
      .withColumn("b", col("id") % 25)      // b in [0, 25)
      .withColumn("payload", concat(lit("new"), col("id")))
    val stats = ClusteredStore.append(spark, dir, delta)
    info(s"append: $stats")

    // exactness: store content == base ∪ delta
    val got = ClusteredStore.read(spark, dir)
      .select("id", "a", "b", "payload")
    val want = base.unionByName(delta)
    assert(got.count() === 20300L)
    assert(got.exceptAll(want).count() === 0L)
    assert(want.exceptAll(got).count() === 0L)

    // bounded scope: a corner append must not rewrite the whole table
    assert(stats.rewritten < 16,
      s"corner append rewrote everything: $stats")
    assert(stats.untouched > 0)
    assert(stats.clamped === 0L, "delta lies inside the frozen bounds")

    // NOTHING is deleted by an append (older versions stay readable):
    // every pre-append file survives byte-identical, and the CURRENT
    // manifest references exactly the untouched ones among them
    val after = dataFiles()
    assert(before.keySet.subsetOf(after.keySet))
    before.keySet.foreach { f => assert(before(f) === after(f), s"$f changed") }
    val current = ClusteredStore.manifest(spark, dir)
      .select("file").collect()
      .map(r => new org.apache.hadoop.fs.Path(r.getString(0)).getName).toSet
    assert(before.keySet.intersect(current).size === stats.untouched)

    // time travel: version 1 is still exactly the pre-append base
    assert(ClusteredStore.currentVersion(spark, dir) === Some(2))
    val v1 = ClusteredStore.read(spark, dir, asOf = Some(1))
      .select("id", "a", "b", "payload")
    assert(v1.count() === 20000L)
    assert(v1.exceptAll(base).count() === 0L)

    // pruned reads stay exact after the append
    val boxes = Seq(Box.between("a", 0L, 60L), Box.between("b", 0L, 40L))
    val pruned = ClusteredStore.readPruned(spark, dir, boxes)
      .agg(count(lit(1)), sum("id")).collect().head
    val full = want.filter(col("a").between(0, 60) && col("b").between(0, 40))
      .agg(count(lit(1)), sum("id")).collect().head
    assert(pruned === full)
  }

  test("rows outside the frozen bounds clamp to edge cells and are " +
    "counted as drift; gap rows become new files without rewrites") {
    val dir = java.nio.file.Files.createTempDirectory("clstore2").toString
    // base occupies two separated clusters → a curve-range GAP between
    val base = mkDocs(0 until 5000)
      .withColumn("a", (col("id") % 100) +
        when(col("id") % 2 === 0, lit(0)).otherwise(lit(900)))
    ClusteredStore.init(base, Seq("a", "b"), 8, dir)

    // out-of-bounds append: a beyond the frozen hi
    val outOfBounds = (9000 until 9050).toDF("id")
      .withColumn("a", lit(5000) + col("id") % 10)
      .withColumn("b", col("id") % 1000)
      .withColumn("payload", lit("oob"))
    val s1 = ClusteredStore.append(spark, dir, outOfBounds)
    assert(s1.clamped === 50L, s"every oob row must count as drift: $s1")

    val got = ClusteredStore.read(spark, dir)
    assert(got.count() === 5050L)
    // clamped rows are IN the store and readable exactly
    assert(got.filter(col("payload") === "oob").count() === 50L)
  }

  test("repeated appends keep the manifest consistent (no duplicate " +
    "files, counts add up) and target file size bounds file growth") {
    val dir = java.nio.file.Files.createTempDirectory("clstore3").toString
    ClusteredStore.init(mkDocs(0 until 8000), Seq("a", "b"), 8, dir)
    var total = 8000L
    for (k <- 1 to 3) {
      val delta = ((10000 * k) until (10000 * k + 500)).toDF("id")
        .withColumn("a", col("id") * 31 % 1000)
        .withColumn("b", col("id") * 17 % 1000)
        .withColumn("payload", lit(s"batch$k"))
      ClusteredStore.append(spark, dir, delta)
      total += 500
      assert(ClusteredStore.read(spark, dir).count() === total)
    }
    val ledger = ClusteredStore.manifest(spark, dir)
    assert(ledger.select("file").distinct().count() === ledger.count(),
      "manifest must list each file once")
    assert(ledger.agg(sum("n_rows")).head.getLong(0) === total)
    def onDisk() = Fs.list(spark, s"$dir/data").map(_.getPath.getName)
      .filterNot(_.startsWith("_")).toSet
    val listed = ledger.select("file").collect()
      .map(r => new org.apache.hadoop.fs.Path(r.getString(0)).getName).toSet
    // retention: disk holds every version's files (a superset of the
    // current manifest) until vacuum drops old versions — after which
    // manifest ↔ disk agree exactly
    assert(listed.subsetOf(onDisk()),
      s"dangling manifest entries: ${listed.diff(onDisk())}")
    assert(ClusteredStore.currentVersion(spark, dir) === Some(4))
    val reclaimed = ClusteredStore.vacuum(spark, dir, keepLast = 1)
    assert(reclaimed > 0, "three appends must leave something to reclaim")
    assert(listed === onDisk(),
      s"post-vacuum stranded files: ${onDisk().diff(listed)}")
    assert(ClusteredStore.read(spark, dir).count() === total,
      "vacuum must not touch the current snapshot")
    // dropped versions are gone, current remains
    assertThrows[Exception](
      ClusteredStore.read(spark, dir, asOf = Some(1)).count())
  }
}
