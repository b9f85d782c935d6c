package graft.ops

import org.apache.spark.sql.catalyst.expressions.{Expression, In, InSet}
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Fs

/** The takedown-scale contract, ENFORCED instead of documented (r11
  * verdict #3 + #6): above [[ClusteredStore.LiteralKeyMax]] keys, every
  * key-set operation switches from literal `IN`-list expressions to
  * broadcast key-frame joins (the plan stays metadata-sized; the keys
  * travel as data), with answers identical to the literal path — and
  * above [[ClusteredStore.DvSpillKeys]] masked keys per file, the
  * deletion vector spills to an immutable sidecar so manifest rows
  * stay metadata-sized no matter how heavy one file's mask gets.
  */
class KeyScaleSpec extends SparkSpec {
  import spark.implicits._

  private def mkDocs(ids: Range) =
    ids.toDF("id")
      .withColumn("key", col("id").cast("long"))
      .withColumn("a", col("id").cast("long") * 7919 % 1000)
      .withColumn("b", col("id").cast("long") * 104729 % 1000)
      .withColumn("payload", concat(lit("row"), col("id")))

  /** Largest literal membership list anywhere in `plan` (In or InSet —
    * Catalyst converts big In lists to InSet, so both count).
    */
  private def maxLiteralIn(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Int = {
    var worst = 0
    def walk(e: Expression): Unit = {
      e match {
        case i: In => worst = math.max(worst, i.list.size)
        case s: InSet => worst = math.max(worst, s.hset.size)
        case _ => ()
      }
      e.children.foreach(walk)
    }
    plan.foreach(_.expressions.foreach(walk))
    worst
  }

  test("a bulk readPoint probe takes the JOIN path: answers identical " +
    "to the literal predicate, and the optimized plan carries NO " +
    "literal IN-list past the threshold") {
    val dir = java.nio.file.Files.createTempDirectory("ks1").toString
    val docs = mkDocs(0 until 60000)
    ClusteredStore.init(docs, Seq("a", "b"), 4, dir,
      bloomCols = Seq("key"))
    val bigKeys = (0L until 60000L by 4).toSeq // 15000 > LiteralKeyMax
    assert(bigKeys.size > ClusteredStore.LiteralKeyMax)

    val got = ClusteredStore.readPoint(spark, dir, "key", bigKeys)
    assert(maxLiteralIn(got.queryExecution.optimizedPlan) <=
      ClusteredStore.LiteralKeyMax,
      "a bulk key probe must never materialize the key set as a " +
        "literal expression")
    val expect = docs.filter(col("key") % 4 === 0)
    assert(got.count() === expect.count())
    assert(got.select("id").except(expect.select("id")).count() === 0L)
    assert(expect.select("id").except(got.select("id")).count() === 0L)

    // and the small-probe literal path still serves (plan may use IN)
    assert(ClusteredStore.readPoint(spark, dir, "key",
      Seq(8L, 12L, 99999L)).count() === 2L)
  }

  test("a bulk deleteKeysDV and a bulk upsert take the join path with " +
    "answers identical to a direct recompute — the 100k-key replace " +
    "batch the r11 contract only documented") {
    val dir = java.nio.file.Files.createTempDirectory("ks2").toString
    val docs = mkDocs(0 until 60000)
    ClusteredStore.init(docs, Seq("a", "b"), 4, dir,
      bloomCols = Seq("key"))

    // bulk takedown: 12000 keys (join path)
    val doomed = (0L until 48000L by 4).toSeq
    assert(doomed.size > ClusteredStore.LiteralKeyMax)
    val st = ClusteredStore.deleteKeysDV(spark, dir, "key", doomed)
    assert(st.deleted === doomed.size.toLong)
    val afterDelete = ClusteredStore.read(spark, dir)
    assert(afterDelete.count() === 60000L - doomed.size)
    assert(filterTo(afterDelete, doomed).isEmpty)

    // bulk replace: a 10001-key batch (join path) — every replaced key
    // serves the new payload, nothing else moves
    val replaced = mkDocs(48000 until 58001).withColumn("payload",
      concat(lit("v2_"), col("id")))
    assert(replaced.count() > ClusteredStore.LiteralKeyMax)
    val up = ClusteredStore.upsertKeys(spark, dir, "key", replaced)
    assert(up.replaced === 10001L)
    val snap = ClusteredStore.read(spark, dir)
    assert(snap.count() === 60000L - doomed.size)
    assert(snap.filter(col("payload").startsWith("v2_")).count() ===
      10001L)
    assert(snap.filter(col("key").between(48000L, 58000L) &&
      !col("payload").startsWith("v2_")).count() === 0L)
  }

  private def filterTo(df: org.apache.spark.sql.DataFrame,
      keys: Seq[Long]): Array[org.apache.spark.sql.Row] = {
    import df.sparkSession.implicits._
    val kf = keys.toDF("_k")
    df.join(broadcast(kf), df("key") === kf("_k"), "left_semi")
      .limit(5).collect()
  }

  test("a mask past DvSpillKeys SPILLS to a sidecar: the manifest row " +
    "carries a pointer (no inline key array), answers are unchanged " +
    "on every read path, later takedowns merge into a fresh sidecar, " +
    "and vacuum reclaims unreferenced sidecars") {
    val dir = java.nio.file.Files.createTempDirectory("ks3").toString
    ClusteredStore.init(mkDocs(0 until 30000), Seq("a", "b"), 2, dir,
      bloomCols = Seq("key"))
    // 20000 masked keys over 2 files (~10000 each > DvSpillKeys =
    // 4096): both spill — and 20000 > LiteralKeyMax, so this is also
    // the join path end-to-end
    val doomed = (0L until 30000L).filterNot(_ % 3 == 0)
    ClusteredStore.deleteKeysDV(spark, dir, "key", doomed)

    val man = ClusteredStore.manifest(spark, dir)
    val spilled = man.filter(col("dv_path").isNotNull)
    assert(spilled.count() > 0, "a >4096-key mask must spill")
    assert(spilled.filter(col("dv_keys").isNotNull).count() === 0L,
      "a spilled row must not ALSO carry the inline array — the " +
        "manifest must stay metadata-sized")
    assert(Fs.list(spark, s"$dir/dv").nonEmpty)

    val snap = ClusteredStore.read(spark, dir)
    assert(snap.count() === 30000L - doomed.size)
    assert(snap.filter(col("key") % 3 =!= 0).count() === 0L)
    assert(ClusteredStore.readPoint(spark, dir, "key",
      Seq(1L, 2L)).count() === 0L)
    assert(ClusteredStore.readPoint(spark, dir, "key",
      Seq(6L, 12L)).count() === 2L)
    assert(ClusteredStore.stats(spark, dir).nRows ===
      30000L - doomed.size)

    // merge: a later takedown on an already-spilled file lands in a
    // NEW sidecar holding the FULL merged list; answers stay exact
    ClusteredStore.deleteKeysDV(spark, dir, "key", Seq(3L, 9L))
    val snap2 = ClusteredStore.read(spark, dir)
    assert(snap2.count() === 30000L - doomed.size - 2)
    assert(snap2.filter(col("key").isin(3L, 9L)).count() === 0L)
    assert(snap2.filter(col("key") % 3 =!= 0).count() === 0L,
      "the merge must keep every previously spilled key masked")

    // disposal: fold the masks physically, then vacuum — data files
    // AND sidecars unreferenced by the kept manifests are reclaimed
    ClusteredStore.compact(spark, dir) // both files are mostly-dead
    assert(ClusteredStore.read(spark, dir).count() ===
      30000L - doomed.size - 2)
    ClusteredStore.vacuum(spark, dir, keepLast = 1)
    assert(Fs.list(spark, s"$dir/dv").isEmpty,
      "no kept manifest references a sidecar — vacuum must reclaim " +
        "them all")
    assert(ClusteredStore.read(spark, dir).count() ===
      30000L - doomed.size - 2)
  }

  test("a mask past DvBroadcastMaxKeys is joined WITHOUT the broadcast " +
    "hint (shuffle join, never a forced megabroadcast) and answers " +
    "stay exact") {
    val dir = java.nio.file.Files.createTempDirectory("ks4").toString
    val n = 1300000
    ClusteredStore.init(mkDocs(0 until n), Seq("a", "b"), 2, dir,
      bloomCols = Seq("key"))
    // ~1.08M masked keys — above the 2^20 broadcast bound
    val doomed = (0L until n.toLong).filterNot(_ % 6 == 0)
    assert(doomed.size > ClusteredStore.DvBroadcastMaxKeys)
    ClusteredStore.deleteKeysDV(spark, dir, "key", doomed)

    val snap = ClusteredStore.read(spark, dir)
    val antiJoins = snap.queryExecution.executedPlan.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
          if j.joinType.sql == "LEFT ANTI" => j
    }
    assert(antiJoins.isEmpty,
      "a >2^20-key mask must not be forced through a broadcast")
    assert(snap.count() === (n.toLong + 5) / 6)
    assert(snap.filter(col("key") % 6 =!= 0).count() === 0L)
  }
}
