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

  test("size() refuses out-of-range fpp instead of degrading silently") {
    // fpp >= 1 used to clamp to a useless 64-bit sketch; fpp <= 0 to NaN
    for (bad <- Seq(0.0, -0.5, 1.0, 1.5))
      intercept[IllegalArgumentException](BloomBits.size(1000L, bad))
    // legal values still size
    assert(BloomBits.size(1000L, 0.01)._1 > 0)
  }

  test("fillReport measures ledger saturation; appendShard refuses a " +
    "saturated or geometry-drifted ledger") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("bloom_fill_spec").toString + "/sketches"
    val cap = 500L
    // half full: report should be healthy
    BloomSuppress.appendShard(
      (1L to 250L).toDF("fp"), "fp", dir, "s0", cap)
    val half = BloomSuppress.fillReport(spark, dir)
    assert(half.nShards === 1 && half.totalKeysIngested === 250L)
    val (mBits, k) = BloomBits.size(cap, 0.01)
    assert(half.mBits === mBits && half.k === k)
    assert(half.bitFillFraction > 0.0 && half.bitFillFraction < 0.5)
    // occupancy inversion should land near the true distinct count
    assert(math.abs(half.estimatedDistinctKeys - 250L) <= 40L,
      s"distinct estimate off: ${half.estimatedDistinctKeys}")
    assert(half.capacityKeys >= (cap * 0.8).toLong &&
      half.capacityKeys <= (cap * 1.2).toLong,
      s"capacity inversion off: ${half.capacityKeys}")
    assert(!half.saturated && half.estimatedFpp < half.declaredFpp)

    // stuff it to ~4x capacity (enforcement off), then: report flags
    // saturation, and the NEXT append refuses with a clear message
    BloomSuppress.appendShard((251L to 2000L).toDF("fp"), "fp", dir, "s1",
      cap, enforceCapacity = false)
    val over = BloomSuppress.fillReport(spark, dir)
    assert(over.saturated, s"4x-capacity ledger not flagged: $over")
    assert(over.estimatedFpp > 2.0 * over.declaredFpp)
    val e = intercept[IllegalArgumentException] {
      BloomSuppress.appendShard(
        (2001L to 2002L).toDF("fp"), "fp", dir, "s2", cap)
    }
    assert(e.getMessage.contains("saturated"))
    // enforcement off still appends (operator's explicit escape hatch)
    BloomSuppress.appendShard((2001L to 2002L).toDF("fp"), "fp", dir, "s2",
      cap, enforceCapacity = false)

    // geometry drift (different capacity → different mBits/k) refuses at
    // append time, not rounds later inside bloom_merge_agg
    val g = intercept[IllegalArgumentException] {
      BloomSuppress.appendShard((1L to 5L).toDF("fp"), "fp", dir, "s3",
        capacityKeys = 50L * cap)
    }
    assert(g.getMessage.contains("geometry"))
  }

  test("an empty ledger fails the sketch read loudly, not deep inside " +
    "codegen on first probe") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("bloom_empty_spec").toString + "/sketches"
    // zero-row ledger with the right schema: bloom_merge_agg emits an
    // empty (headerless) byte array
    spark.emptyDataset[(String, Long, Double, Array[Byte])]
      .toDF("shard", "n_keys", "fpp", "sketch")
      .write.parquet(dir)
    val e = intercept[IllegalArgumentException](
      BloomSuppress.ledgerSketch(spark, dir))
    assert(e.getMessage.contains("no sketches"))
    // and a headerless sketch handed straight to the anti-join also
    // refuses with the actionable message
    val e2 = intercept[IllegalArgumentException](
      BloomSuppress.antiJoinSketch(docs, trained.select(col("fp")), "fp",
        Array.emptyByteArray))
    assert(e2.getMessage.contains("header"))
  }
}
