package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The skew-guard recall trade, MEASURED at a scale where the cap binds
  * (r10 advice: the cap change altered recall in 1025–4096-member
  * buckets and the change was asserted only where it could not bind).
  * Pins the documented contract of [[SkewGuard.saltOversized]]:
  *
  *  - healthy buckets (<= cap): bit-identical pairs, nothing dropped;
  *  - oversized buckets: every WITHIN-salt pair survives (completeness
  *    is exact per salt group), cross-salt pairs are dropped — pair
  *    recall ~1/salts, measured and reported;
  *  - downstream clustering resolves the bucket into at most
  *    `ceil(n/cap)` internally-complete clusters — the dedup-rate cost
  *    (that many surviving representatives instead of one), never a
  *    correctness cost on rows that survive.
  */
class SkewGuardRecallSpec extends SparkSpec {
  import spark.implicits._

  private val cap = 100
  private val mega = 350 // one bucket at 3.5× the cap → 4 salt groups

  test("cap-binding bucket: within-salt pairs complete, pair recall " +
    "~1/salts (measured), healthy buckets bit-identical, clusters " +
    "fragment to at most ceil(n/cap) internally-complete groups") {
    // one mega-bucket of 350 + ten healthy buckets of 3
    val banded =
      (0 until mega).map(i => ("mega", i.toLong)) ++
        (0 until 10).flatMap(b =>
          (0 until 3).map(j => (s"h$b", 1000L + b * 10 + j)))
    val df = banded.toDF("bucket", "doc_id")

    val salted = SkewGuard.saltOversized(df, Seq("bucket"), "doc_id",
      cap = cap, metricName = s"recall_gate_${System.nanoTime()}")
    val pairs = salted
      .groupBy(col("bucket"), col("salt"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .select(col("bucket"), col("salt"), explode(expr(
        """flatten(transform(ids, (a, i) ->
             transform(slice(ids, i + 2, size(ids)),
               b -> struct(a, b))))""")).as("p"))
      .select(col("bucket"), col("salt"),
        col("p.a").as("a"), col("p.b").as("b"))
      .persist()

    // healthy buckets: exactly C(3,2)=3 pairs each — the guard is
    // bit-identical off the oversized path
    val healthy = pairs.filter(col("bucket") =!= "mega")
    assert(healthy.count() === 10L * 3)
    assert(healthy.select("salt").distinct().collect()
      .map(_.getInt(0)).toSeq === Seq(0))

    // oversized bucket: pair count == Σ C(g,2) over its salt groups —
    // within-salt completeness is EXACT, so the only loss is cross-salt
    val groups = SkewGuard.groupSizes(
        salted.filter(col("bucket") === "mega"), Seq("bucket"))
      .select("group_n").collect().map(_.getLong(0))
    val expectWithin = groups.map(g => g * (g - 1) / 2).sum
    val megaPairs = pairs.filter(col("bucket") === "mega").count()
    assert(megaPairs === expectWithin,
      s"within-salt pairs must survive exactly: $megaPairs vs $expectWithin")

    val totalPairs = mega.toLong * (mega - 1) / 2
    val salts = math.ceil(mega.toDouble / cap).toInt
    val recall = megaPairs.toDouble / totalPairs
    // measured trade: ~1/salts, never below half that (hash imbalance)
    assert(recall < 0.5 && recall > 0.5 / salts,
      f"pair recall $recall%.3f outside the documented ~1/$salts band")
    info(f"oversized bucket n=$mega cap=$cap: $megaPairs/$totalPairs " +
      f"pairs survive (recall $recall%.3f, ${groups.length} salt groups)")

    // cluster-level cost: the mega bucket resolves into exactly its
    // salt groups — at most ceil(n/cap) clusters, each internally
    // complete; a keep-one-canonical pass keeps <= that many
    // representatives instead of one, and drops nothing it shouldn't
    val clusters = DedupClusters.connectedComponents(
      pairs.filter(col("bucket") === "mega").select("a", "b"))
    val byCluster = clusters.groupBy("cluster_id")
      .agg(count(lit(1)).as("n")).collect().map(_.getLong(1)).sorted
    assert(byCluster.length === groups.count(_ > 0),
      "clusters must be exactly the salt groups")
    assert(byCluster.length <= salts)
    assert(byCluster.toSeq === groups.sorted.toSeq,
      "each cluster must be one complete salt group")
    pairs.unpersist()
    ()
  }

  test("at or below the cap nothing salts: the guarded plan's pairs " +
    "are the unguarded plan's pairs") {
    val banded = (0 until cap).map(i => ("one", i.toLong))
    val df = banded.toDF("bucket", "doc_id")
    val salted = SkewGuard.saltOversized(df, Seq("bucket"), "doc_id",
      cap = cap, metricName = s"recall_gate2_${System.nanoTime()}")
    assert(salted.filter(col("salt") =!= 0).count() === 0L)
    val n = salted.groupBy("bucket", "salt")
      .agg(count(lit(1)).as("n")).collect().head.getAs[Long]("n")
    assert(n === cap.toLong)
  }
}
