package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** BloomSuppress contract: the sketch-pruned anti-join returns EXACTLY
  * the plain anti-join's rows (no false negatives ever, false positives
  * verified away); the probe prunes — the exact-join branch sees only the
  * hit sliver, not the corpus; sketches built per-shard through the
  * ledger union to the same answers as a one-shot build.
  */
class BloomSuppressSpec extends SparkSpec {
  import graft.queries.tbl
  import graft.functions.BloomBits

  private def docs = tbl(spark, sf(), "documents")
    .withColumn("fp", expr("md5num(text)"))
  private def trained = docs.filter(col("doc_id") % 3 === 0)

  private def exactSurvivors: Set[Long] =
    docs.join(trained.select("fp").distinct(), Seq("fp"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).toSet

  test("antiJoin equals the exact anti-join") {
    val got = BloomSuppress.antiJoin(docs, trained.select(col("fp")), "fp")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val want = exactSurvivors
    assert(got === want)
    assert(want.nonEmpty && want.size < docs.count(),
      "fixture should suppress some but not all docs")
  }

  test("probe prunes: the verify branch sees only hits, and misses never " +
    "reach a join") {
    val bf = BloomSuppress.sketch(trained.select(col("fp")), "fp")
    val hits = docs.filter(
      call_function("bloom_contains", typedLit(bf), col("fp"))).count()
    val trueMatches = docs.join(
      trained.select("fp").distinct(), Seq("fp"), "left_semi").count()
    val n = docs.count()
    assert(hits >= trueMatches, "no false negatives")
    // at fpp=1% on this corpus the hit set must stay close to the truth —
    // the whole point is that only ~matches are shuffled
    assert(hits - trueMatches <= math.max(5L, n / 20),
      s"false-positive sliver too large: hits=$hits true=$trueMatches n=$n")
  }

  test("measured false-positive rate honors the sizing formula") {
    val keys = (1L to 2000L).toSeq
    val (mBits, k) = BloomBits.size(keys.size, 0.01)
    val words = new Array[Long](mBits / 64)
    keys.foreach(BloomBits.set(words, mBits, k, _))
    val bytes = BloomBits.serialize(words, mBits, k)
    keys.foreach(key => assert(BloomBits.contains(bytes, key)))
    val probes = (1_000_000L until 1_020_000L)
    val fp = probes.count(BloomBits.contains(bytes, _))
    val rate = fp.toDouble / probes.size
    assert(rate < 0.03, s"fpp way over target: $rate")
  }

  test("ledger shards union to the one-shot sketch's answers and " +
    "re-appending a shard is idempotent") {
    val dir = java.nio.file.Files
      .createTempDirectory("bloom_ledger_spec").toString + "/sketches"
    val cap = trained.count()
    BloomSuppress.appendShard(
      trained.filter(col("doc_id") % 2 === 0).select(col("fp")),
      "fp", dir, "even", cap)
    BloomSuppress.appendShard(
      trained.filter(col("doc_id") % 2 === 1).select(col("fp")),
      "fp", dir, "odd", cap)
    // crash-replay: same shard appended twice — union is idempotent
    BloomSuppress.appendShard(
      trained.filter(col("doc_id") % 2 === 1).select(col("fp")),
      "fp", dir, "odd", cap)
    assert(spark.read.parquet(dir).count() === 3)
    val bf = BloomSuppress.ledgerSketch(spark, dir)
    val got = BloomSuppress
      .antiJoinSketch(docs, trained.select(col("fp")), "fp", bf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got === exactSurvivors)
  }

  test("union refuses mismatched geometries") {
    val a = BloomBits.serialize(new Array[Long](2), 128, 3)
    val b = BloomBits.serialize(new Array[Long](4), 256, 3)
    intercept[IllegalArgumentException](BloomBits.union(a, b))
  }
}
