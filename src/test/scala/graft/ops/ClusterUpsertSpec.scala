package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Fs

/** Atomic replace-by-key ([[ClusteredStore.upsertKeys]]): ONE claimed
  * commit removes every existing live row carrying a batch key and
  * lands the batch clustered — no delete+append pair, no visible
  * in-between state. Old rows in files the batch rewrites anyway fold
  * physically for free; old rows in untouched files are masked by
  * deletion vectors. Plus the time-based vacuum retention clock
  * (`olderThanMs`): a version outside `keepLast` survives while its
  * commit is younger than the window.
  */
class ClusterUpsertSpec extends SparkSpec {
  import spark.implicits._

  private def mkDocs(ids: Range, tag: String = "v1") =
    ids.toDF("id")
      .withColumn("key", col("id").cast("long"))
      .withColumn("a", col("id").cast("long") * 7919 % 1000)
      .withColumn("b", col("id").cast("long") * 104729 % 1000)
      .withColumn("payload", concat(lit(tag), lit("-"), col("id")))

  test("upsert is ONE commit: replaced keys serve the new rows, new " +
    "keys insert, the old generation shows only in time travel, and " +
    "replaced-row accounting matches") {
    val dir = java.nio.file.Files.createTempDirectory("ups1").toString
    ClusteredStore.init(mkDocs(0 until 3000), Seq("a", "b"), 5, dir,
      bloomCols = Seq("key"))
    val v0 = ClusteredStore.currentVersion(spark, dir).get

    // replace 40 existing keys + insert 10 brand-new ones, in one call
    val batch = mkDocs(100 until 140, tag = "v2")
      .unionByName(mkDocs(10000 until 10010, tag = "v2"))
    val st = ClusteredStore.upsertKeys(spark, dir, "key", batch)
    assert(st.version === v0 + 1, "upsert must be exactly one commit")
    assert(st.replaced === 40L, s"replaced accounting: $st")

    val snap = ClusteredStore.read(spark, dir)
    assert(snap.count() === 3010L)
    // every upserted key serves EXACTLY the new row
    assert(snap.filter(col("key").between(100L, 139L) &&
      col("payload").startsWith("v2")).count() === 40L)
    assert(snap.filter(col("key").between(100L, 139L) &&
      col("payload").startsWith("v1")).count() === 0L,
      "old generation leaked past the upsert")
    assert(snap.filter(col("key") >= 10000L).count() === 10L)
    // point lookups agree
    val pt = ClusteredStore.readPoint(spark, dir, "key", Seq(120L))
      .select("payload").collect().map(_.getString(0)).toSeq
    assert(pt === Seq("v2-120"))
    // the in-between state never existed, but the BEFORE state did:
    // time travel serves the old generation intact
    assert(ClusteredStore.read(spark, dir, asOf = Some(v0))
      .filter(col("key") === 120L).select("payload")
      .head().getString(0) === "v1-120")
  }

  test("null-keyed batch rows insert without replacing anything; an " +
    "upsert over files masked on a DIFFERENT column folds them " +
    "copy-on-write in the same commit — no manual compact, no second " +
    "mask column") {
    val dir = java.nio.file.Files.createTempDirectory("ups2").toString
    ClusteredStore.init(mkDocs(0 until 1000), Seq("a", "b"), 2, dir,
      bloomCols = Seq("key"))
    val withNull = mkDocs(500 until 502, tag = "v2")
      .withColumn("key",
        when(col("id") === 501, lit(null).cast("long"))
          .otherwise(col("key")))
    val st = ClusteredStore.upsertKeys(spark, dir, "key", withNull)
    assert(st.replaced === 1L) // only key=500 replaced; null row inserts
    assert(ClusteredStore.read(spark, dir).count() === 1001L)

    // mask on the OTHER key domain, then upsert on `key`: id-masked
    // files that may contain the upsert keys are forced into the
    // rewrite set (their masks fold physically); others legitimately
    // keep their id masks. The upsert commits atomically as before —
    // the old behavior here was a refusal demanding a manual compact
    // (r11 verdict: multi-domain masking is the norm, not the
    // exception).
    ClusteredStore.deleteKeysDV(spark, dir, "id", Seq(7L))
    val st2 = ClusteredStore.upsertKeys(spark, dir, "key",
      mkDocs(600 until 601, tag = "v3"))
    assert(st2.replaced === 1L)
    val snap = ClusteredStore.read(spark, dir)
    assert(snap.count() === 1000L) // 1001 - masked id=7; 600 replaced
    assert(snap.filter(col("id") === 7).count() === 0L,
      "the other domain's takedown must stay in force")
    assert(snap.filter(col("key") === 600L &&
      col("payload").startsWith("v3")).count() === 1L)
    // per-file invariant: one mask column per file, always — an
    // id-masked file that took part in this upsert folded; none ever
    // gained a second mask column
    val man = ClusteredStore.manifest(spark, dir)
    if (man.columns.contains("dv_col")) {
      val perFileCols = man.filter(col("dv_col").isNotNull)
        .groupBy("file")
        .agg(countDistinct("dv_col").as("nc"))
      assert(perFileCols.filter(col("nc") > 1).count() === 0L)
    }
    assert(!Fs.exists(spark,
      s"$dir/ledger/claim-v=${ClusteredStore.currentVersion(spark, dir).get + 1}"),
      "no dangling claim after the upsert")
  }

  test("repeated upserts converge (latest wins) and maintenance folds " +
    "the masks away without changing answers") {
    val dir = java.nio.file.Files.createTempDirectory("ups3").toString
    ClusteredStore.init(mkDocs(0 until 2000), Seq("a", "b"), 3, dir,
      bloomCols = Seq("key"))
    ClusteredStore.upsertKeys(spark, dir, "key",
      mkDocs(50 until 80, tag = "v2"))
    ClusteredStore.upsertKeys(spark, dir, "key",
      mkDocs(60 until 90, tag = "v3"))
    def check(): Unit = {
      val snap = ClusteredStore.read(spark, dir)
      assert(snap.count() === 2000L)
      assert(snap.filter(col("key").between(50, 59) &&
        col("payload").startsWith("v2")).count() === 10L)
      assert(snap.filter(col("key").between(60, 89) &&
        col("payload").startsWith("v3")).count() === 30L)
      assert(snap.filter(col("payload").startsWith("v1")).count() ===
        2000L - 40L)
    }
    check()
    ClusteredStore.compact(spark, dir, minRowsPerFile = 3000)
    check() // fold changed bytes, not answers
    ClusteredStore.vacuum(spark, dir, keepLast = 1)
    check()
  }

  test("vacuum olderThanMs: versions outside keepLast survive while " +
    "younger than the window, and drop once backdated past it") {
    val dir = java.nio.file.Files.createTempDirectory("ups4").toString
    ClusteredStore.init(mkDocs(0 until 500), Seq("a", "b"), 2, dir)
    ClusteredStore.append(spark, dir, mkDocs(500 until 600))
    ClusteredStore.append(spark, dir, mkDocs(600 until 700))
    def versions() = ClusteredStore.history(spark, dir)
      .select("version").collect().map(_.getInt(0)).sorted.toSeq

    // time window protects what the count policy would drop
    ClusteredStore.vacuum(spark, dir, keepLast = 1,
      olderThanMs = 3600000L)
    assert(versions() === Seq(1, 2, 3),
      "fresh versions must survive a windowed vacuum")
    assert(ClusteredStore.read(spark, dir, asOf = Some(1)).count() === 500L)

    // backdate v1's commit past the window: it alone drops
    val marker = java.nio.file.Paths.get(s"$dir/ledger/v=1/_SUCCESS")
    java.nio.file.Files.setLastModifiedTime(marker,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 7200000L))
    ClusteredStore.vacuum(spark, dir, keepLast = 1,
      olderThanMs = 3600000L)
    assert(versions() === Seq(2, 3))
    assert(ClusteredStore.read(spark, dir).count() === 700L)
  }
}
