package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Fs

/** Column rename/drop as METADATA COMMITS on the versioned schema
  * anchor, resolved by stable parquet field ids (r10 verdict item 5):
  * a rename touches zero data files — old files keep the old name in
  * their footers and id-resolved reads serve both generations as one
  * logical column; a drop is a projection; a re-added name gets a
  * fresh id so dropped bytes never resurrect. Plus the r10-advice
  * anchor fix: widening/evolution writes a NEW marker-gated anchor
  * version — never an overwrite — so no reader can catch a torn or
  * absent anchor and no crash reverts the store to inference.
  */
class ColumnEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def mkDocs(ids: Range) =
    ids.toDF("id")
      .withColumn("a", col("id").cast("long") * 7919 % 1000)
      .withColumn("b", col("id").cast("long") * 104729 % 1000)
      .withColumn("score", col("id").cast("double") / 7.0)
      .withColumn("payload", concat(lit("row"), col("id")))

  test("rename is a zero-rewrite metadata commit: pre- and post-rename " +
    "files serve ONE column, time travel follows the latest name, and " +
    "the data dir is byte-identical") {
    val dir = java.nio.file.Files.createTempDirectory("colev1").toString
    ClusteredStore.init(mkDocs(0 until 2000), Seq("a", "b"), 3, dir)
    val filesBefore = Fs.list(spark, s"$dir/data")
      .map(s => s.getPath.getName -> s.getLen).toMap

    ClusteredStore.renameColumn(spark, dir, "score", "quality")
    assert(Fs.list(spark, s"$dir/data")
      .map(s => s.getPath.getName -> s.getLen).toMap === filesBefore,
      "rename must not touch a single data file")

    // pre-rename files answer under the new name
    val snap = ClusteredStore.read(spark, dir)
    assert(snap.columns.contains("quality") && !snap.columns.contains("score"))
    val s1 = snap.agg(sum(col("quality"))).head().getDouble(0)
    val expect = mkDocs(0 until 2000).agg(sum(col("score")))
      .head().getDouble(0)
    assert(math.abs(s1 - expect) < 1e-6)

    // post-rename appends write the NEW name; both generations merge
    ClusteredStore.append(spark, dir,
      mkDocs(2000 until 2500).withColumnRenamed("score", "quality"))
    val all = ClusteredStore.read(spark, dir)
    assert(all.count() === 2500L)
    val s2 = all.agg(sum(col("quality"))).head().getDouble(0)
    val expect2 = mkDocs(0 until 2500).agg(sum(col("score")))
      .head().getDouble(0)
    assert(math.abs(s2 - expect2) < 1e-6)

    // time travel serves old snapshots under the LATEST schema (the
    // documented evolution contract)
    val tt = ClusteredStore.read(spark, dir, asOf = Some(1))
    assert(tt.columns.contains("quality"))
    assert(tt.count() === 2000L)

    // a pre-rename-schema batch now refuses (its column set no longer
    // matches the anchor) — no silent fork
    val e = intercept[IllegalArgumentException](
      ClusteredStore.append(spark, dir, mkDocs(9000 until 9010)))
    assert(e.getMessage.contains("schema differs"))
  }

  test("drop is a projection; a re-added column with the same NAME has " +
    "a fresh field id, so the dropped bytes never resurrect") {
    val dir = java.nio.file.Files.createTempDirectory("colev2").toString
    ClusteredStore.init(mkDocs(0 until 1000), Seq("a", "b"), 2, dir)
    ClusteredStore.dropColumn(spark, dir, "score")
    val snap = ClusteredStore.read(spark, dir)
    assert(!snap.columns.contains("score"))
    assert(snap.count() === 1000L)

    // additive re-add of the SAME name: old files' 'score' bytes are a
    // DIFFERENT field id now — they must read as null, not resurrect
    ClusteredStore.append(spark, dir,
      mkDocs(1000 until 1200).drop("score")
        .withColumn("score", lit(42.0)),
      mergeSchema = true)
    val again = ClusteredStore.read(spark, dir)
    assert(again.filter(col("id") < 1000 && col("score").isNotNull)
      .count() === 0L,
      "dropped column's old bytes resurrected under a re-added name")
    assert(again.filter(col("id") >= 1000 && col("score") === 42.0)
      .count() === 200L)
  }

  test("ambiguous or unsafe evolutions refuse loudly: clustering and " +
    "Bloom columns, unknown names, collisions, and the last column") {
    val dir = java.nio.file.Files.createTempDirectory("colev3").toString
    ClusteredStore.init(mkDocs(0 until 500), Seq("a", "b"), 2, dir,
      bloomCols = Seq("id"))
    def refused(f: => Unit, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](f)
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    refused(ClusteredStore.renameColumn(spark, dir, "a", "a2"),
      "clustering column")
    refused(ClusteredStore.renameColumn(spark, dir, "id", "id2"),
      "Bloom")
    refused(ClusteredStore.renameColumn(spark, dir, "nope", "x"),
      "no column")
    refused(ClusteredStore.renameColumn(spark, dir, "score", "payload"),
      "already exists")
    refused(ClusteredStore.dropColumn(spark, dir, "a"),
      "clustering column")
    refused(ClusteredStore.dropColumn(spark, dir, "id"), "Bloom")
    refused(ClusteredStore.dropColumn(spark, dir, "nope"), "no column")
    // nothing was changed by any refusal
    assert(ClusteredStore.read(spark, dir).columns.sorted.toSeq ===
      Seq("a", "b", "id", "payload", "score"))
  }

  test("a column keying LIVE deletion vectors refuses rename AND drop " +
    "(masks are name-bound: every read of a masked file would throw " +
    "after the evolution) until the masks are folded out of every " +
    "retained version") {
    val dir = java.nio.file.Files.createTempDirectory("colev5").toString
    // mask on `id` but NO clustering/Bloom involvement for `id`: only
    // the new DV refusal can be what blocks the evolution
    ClusteredStore.init(mkDocs(0 until 2000), Seq("a", "b"), 3, dir)
    val d = ClusteredStore.deleteKeysDV(spark, dir, "id", Seq(7L, 19L))
    assert(d.deleted === 2L && d.rewritten === 0)

    def refused(f: => Unit): Unit = {
      val e = intercept[IllegalArgumentException](f)
      assert(e.getMessage.contains("deletion-vector"), e.getMessage)
    }
    refused(ClusteredStore.renameColumn(spark, dir, "id", "doc_id"))
    refused(ClusteredStore.dropColumn(spark, dir, "id"))
    // refusals changed nothing: masked reads still serve
    assert(ClusteredStore.read(spark, dir).count() === 1998L)

    // recluster folds every mask into clean files — but the MASKED
    // versions are still retained, and time travel reads them through
    // readFilesDv(col("id")): the refusal must hold until vacuum
    ClusteredStore.recluster(spark, dir, nFiles = 3)
    refused(ClusteredStore.renameColumn(spark, dir, "id", "doc_id"))
    ClusteredStore.vacuum(spark, dir, keepLast = 1)
    ClusteredStore.renameColumn(spark, dir, "id", "doc_id")
    val snap = ClusteredStore.read(spark, dir)
    assert(snap.columns.contains("doc_id"))
    assert(snap.count() === 1998L)
    assert(snap.filter(col("doc_id").isin(7L, 19L)).count() === 0L,
      "the folded takedown resurrected under the rename")
  }

  test("type widening is a zero-rewrite metadata commit: int->bigint " +
    "and float->double serve pre- and post-widening files as ONE " +
    "column; Bloom probes and deletion-vector masks survive (both " +
    "hash the BIGINT value); unsafe casts refuse") {
    val dir = java.nio.file.Files.createTempDirectory("colev6").toString
    val docs = mkDocs(0 until 2000)
      .withColumn("score32", col("score").cast("float"))
      .drop("score")
    ClusteredStore.init(docs, Seq("a", "b"), 3, dir,
      bloomCols = Seq("id"))
    // a live DV mask on the to-be-widened Bloom column: the mask's key
    // list is CAST(id AS BIGINT) values, which the widening preserves
    ClusteredStore.deleteKeysDV(spark, dir, "id", Seq(7L, 19L))
    val filesBefore = Fs.list(spark, s"$dir/data")
      .map(s => s.getPath.getName -> s.getLen).toMap

    import org.apache.spark.sql.types.{DoubleType, LongType}
    ClusteredStore.widenColumnType(spark, dir, "id", LongType)
    ClusteredStore.widenColumnType(spark, dir, "score32", DoubleType)
    assert(Fs.list(spark, s"$dir/data")
      .map(s => s.getPath.getName -> s.getLen).toMap === filesBefore,
      "widening must not touch a single data file")

    // old (narrow) files serve under the widened schema, masks applied
    val snap = ClusteredStore.read(spark, dir)
    assert(snap.schema("id").dataType === LongType)
    assert(snap.schema("score32").dataType === DoubleType)
    assert(snap.count() === 1998L)
    assert(snap.filter(col("id").isin(7L, 19L)).count() === 0L,
      "the DV mask lost its rows under the widening")

    // post-widening appends land WIDE; both file generations are one
    // logical column in aggregates and Bloom-pruned point reads
    val wide = mkDocs(2000 until 2500)
      .withColumn("score32", col("score").cast("float").cast("double"))
      .drop("score")
      .withColumn("id", col("id").cast("long"))
    ClusteredStore.append(spark, dir, wide)
    val all = ClusteredStore.read(spark, dir)
    assert(all.count() === 2498L)
    val wantSum = (0L until 2500L).sum - 7L - 19L
    assert(all.agg(sum(col("id"))).head().getLong(0) === wantSum)
    val pt = ClusteredStore.readPoint(spark, dir, "id",
      Seq(42L, 2400L)).select("id").collect().map(_.getLong(0)).sorted
    assert(pt.toSeq === Seq(42L, 2400L),
      "Bloom point lookup broke across the widening")

    // narrow batches refuse loudly with cast guidance (append contract)
    val e0 = intercept[IllegalArgumentException](
      ClusteredStore.append(spark, dir, mkDocs(9000 until 9010)
        .withColumn("score32", col("score").cast("float")).drop("score")))
    assert(e0.getMessage.contains("re-types"), e0.getMessage)

    // refusals: narrowing, cross-family, clustering, unknown
    def refused(f: => Unit, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](f)
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    refused(ClusteredStore.widenColumnType(spark, dir, "id",
      org.apache.spark.sql.types.IntegerType), "not a supported widening")
    refused(ClusteredStore.widenColumnType(spark, dir, "payload",
      LongType), "not a supported widening")
    refused(ClusteredStore.widenColumnType(spark, dir, "a", LongType),
      "clustering")
    refused(ClusteredStore.widenColumnType(spark, dir, "nope", LongType),
      "no column")
  }

  test("evolution serializes through the claim, and every anchor write " +
    "is a NEW marker-gated version — a crashed write leaves the old " +
    "anchor governing, and vacuum keeps only the newest") {
    val dir = java.nio.file.Files.createTempDirectory("colev4").toString
    ClusteredStore.init(mkDocs(0 until 500), Seq("a", "b"), 2, dir)

    // a live claim blocks evolution like any maintainer
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/ledger/claim-v=2"),
      "holder".getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE_NEW)
    intercept[ConcurrentCommitException](
      ClusteredStore.renameColumn(spark, dir, "score", "quality"))
    Fs.delete(spark, s"$dir/ledger/claim-v=2")

    // a crashed anchor write = markerless dir; the old anchor outranks
    // it and reads keep serving (the r10-advice torn-window fix)
    mkDocs(0 until 1).drop("score")
      .limit(0).write.parquet(s"$dir/schema/v=99")
    Fs.delete(spark, s"$dir/schema/v=99/_SUCCESS")
    assert(ClusteredStore.read(spark, dir).columns.contains("score"))

    ClusteredStore.renameColumn(spark, dir, "score", "quality")
    assert(ClusteredStore.read(spark, dir).columns.contains("quality"))
    // vacuum trims superseded + markerless anchors, keeps the governing
    ClusteredStore.vacuum(spark, dir, keepLast = 1)
    val anchors = Fs.list(spark, s"$dir/schema")
      .map(_.getPath.getName).filter(_.startsWith("v=")).sorted
    assert(anchors.length === 1, s"anchors: $anchors")
    assert(ClusteredStore.read(spark, dir).columns.contains("quality"))
  }
}
