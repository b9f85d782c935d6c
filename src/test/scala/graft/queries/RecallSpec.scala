package graft.queries

import graft.SparkSpec

/** Quality measurement for the approximate operators: the approximate
  * result is only useful if its recall against the exact ground truth is
  * known. Run at sf0.001 (500 docs / 500 vectors).
  */
class RecallSpec extends SparkSpec {

  test("IVF-Flat recall@10 vs brute force is usable (≥ 0.5 at nprobe=4/32)") {
    val exact = SimilarityQueries.knnBrute.spark(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = SimilarityQueries.knnIvf.spark(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    info(f"IVF recall@10 = $recall%.3f")
    assert(recall >= 0.5, f"recall $recall%.3f too low")
    assert(recall <= 1.0)
  }

  test("hyperplane-LSH ANN recall@10 vs brute force is usable " +
    "(6 bits, Hamming-1 multi-probe)") {
    val exact = SimilarityQueries.knnBrute.spark(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = SimilarityQueries.knnLsh.spark(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    // single-table, radius-1 probing scans ~11% of the corpus (7 of 64
    // buckets); ≥2× the random-baseline recall proves the hash is doing
    // its job — production recall comes from L independent tables or a
    // larger probe radius (both widen the same plan, see SCALE.md)
    val recall = (exact & approx).size.toDouble / exact.size
    info(f"LSH-ANN recall@10 = $recall%.3f")
    assert(recall >= 0.22, f"recall $recall%.3f below 2x the scan fraction")
  }

  test("multi-table LSH amplifies recall to a production operating point " +
    "(≥ 0.8 at 6 tables, Hamming-1), scanned fraction reported") {
    val exact = SimilarityQueries.knnBrute.spark(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    def recallOf(q: Q) = (exact & q.spark(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet)
      .size.toDouble / exact.size
    val single = recallOf(SimilarityQueries.knnLsh)
    val multi = recallOf(SimilarityQueries.knnLshMulti)
    // cost side of the trade: candidates actually scored, as a fraction
    // of what brute force scores (nQueries × (corpus − 1))
    val nCands = SimilarityQueries.lshMultiCandidates(spark, sf()).count()
    val corpusN = tbl(spark, sf(), "embeddings").count()
    val scanned =
      nCands.toDouble / (SimilarityQueries.nQueries * (corpusN - 1))
    info(f"LSH recall@10: single-table $single%.3f, 6-table $multi%.3f, " +
      f"scanned fraction $scanned%.3f")
    assert(multi > single, "amplification did not improve recall")
    assert(multi >= 0.8, f"6-table recall $multi%.3f below 0.8")
    assert(scanned < 1.0, "LSH scans the whole corpus — no pruning left")
  }

  test("sign-LSH embedding dedup recovers the label-quadratic ground " +
    "truth's pairs (8 tables × 4 bits, fixture's cos≥0.4 regime)") {
    val exact = DedupQueries.embeddingCosine.spark(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lshRows = DedupQueries.embeddingLsh.spark(spark, sf()).collect()
    val lsh = lshRows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = if (exact.isEmpty) 1.0
      else (exact & lsh).size.toDouble / exact.size
    info(f"sign-LSH dedup recall = $recall%.3f (${exact.size} true pairs)")
    assert(exact.nonEmpty, "fixture has no cos≥0.4 pairs — weak test")
    // θ≈63–66° pairs collide per 4-bit table w.p. ~0.18 → ~0.8 at L=8;
    // on a true near-dup corpus (cos≥0.9) the same plan sits at ~0.998
    assert(recall >= 0.6, f"sign-LSH recall $recall%.3f below expectation")
    // precision is 1.0 by construction (exact cosine verify on candidates)
    assert(lsh.subsetOf(exact), "LSH emitted a pair outside ground truth")
  }

  test("MinHash-LSH finds every high-jaccard pair the exact scan finds " +
    "(recall at τ=0.5 with 16 hashes / 4 bands)") {
    val exact = DedupQueries.ngramJaccard.spark(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = DedupQueries.minhashLsh.spark(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the exact scan is blocked by (lang, |Δlen|≤50); LSH is not, so
    // compare on the exact set's domain
    val found = (exact & lsh).size.toDouble
    val recall = if (exact.isEmpty) 1.0 else found / exact.size
    info(f"LSH recall = $recall%.3f (${exact.size} true pairs)")
    assert(recall >= 0.75, f"LSH recall $recall%.3f below expectation")
  }
}
