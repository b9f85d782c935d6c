package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SemanticDedup contract: cluster assignment follows the frozen centroid
  * set, and a vector is dropped iff an earlier same-cluster vector is
  * within the cosine threshold — order-free, deterministic, and safe on
  * empty input.
  */
class SemanticDedupSpec extends SparkSpec {

  private def frame(rows: Seq[(Long, Seq[Double])]) = {
    import spark.implicits._
    graft.functions.GraftFunctions.ensureRegistered(spark)
    rows.toDF("vec_id", "v")
      .withColumn("nrm", expr("dot_product(v, v)"))
  }

  test("keeps the earliest of each near-identical group, within clusters") {
    val corpus = frame(Seq(
      0L -> Seq(1.0, 0.0),      // centroid / first of bucket 0
      1L -> Seq(0.0, 1.0),      // centroid / first of bucket 1
      2L -> Seq(0.999, 0.01),   // ~id0 → dropped
      3L -> Seq(0.8, 0.6),      // bucket 0 but cos(id0)=0.8 < τ → kept
      4L -> Seq(0.999, 0.012))) // ~id0/id2 → dropped
    val cents = VectorIndex.centroidsFrom(corpus, 2)
    assert(cents.map(_.id) === Seq(0L, 1L))
    val marked = SemanticDedup.mark(
        corpus.withColumn("bucket", VectorIndex.assignBucket(cents)),
        "vec_id", threshold = 0.95)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(marked === Map(0L -> true, 1L -> true, 2L -> false,
      3L -> true, 4L -> false))
  }

  test("drop rule is order-free: dropping needs only an EARLIER neighbor") {
    // chain: 10 ~ 11 ~ 12 but 10 !~ 12 (threshold between): with the
    // earlier-neighbor rule 11 and 12 both drop against 10's group only
    // if actually within τ of an earlier member — 12 is within τ of 11
    // (dropped members still suppress later ones; SemDeDup semantics,
    // not connected-component clustering).
    val corpus = frame(Seq(
      0L -> Seq(1.0, 0.0),
      1L -> Seq(0.98, 0.199),   // cos(id0) ≈ 0.98 ≥ τ → dropped
      2L -> Seq(0.92, 0.392))) // cos(id0) ≈ 0.92 < τ, cos(id1) ≈ 0.979 ≥ τ → dropped
    val cents = VectorIndex.centroidsFrom(corpus, 1)
    val marked = SemanticDedup.mark(
        corpus.withColumn("bucket", VectorIndex.assignBucket(cents)),
        "vec_id", threshold = 0.95)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(marked(0L) && !marked(1L) && !marked(2L))
  }

  test("pair budget is an executable contract: an adversarial single " +
    "cluster refuses before materializing any pair") {
    val corpus = frame((0L until 40L).map(i => i -> Seq(1.0, 0.0)))
    val cents = VectorIndex.centroidsFrom(corpus, 1)
    val e = intercept[IllegalArgumentException] {
      SemanticDedup.mark(
        corpus.withColumn("bucket", VectorIndex.assignBucket(cents)),
        "vec_id", threshold = 0.9, maxPairs = 1000L)
    }
    assert(e.getMessage.contains("quadratic verifier refused"), e.getMessage)
  }

  test("empty corpus degrades to a typed empty result") {
    val empty = frame(Seq.empty)
    val cents = VectorIndex.centroidsFrom(empty, 4)
    assert(cents.isEmpty)
    val out = SemanticDedup.mark(
      empty.withColumn("bucket", VectorIndex.assignBucket(cents)),
      "vec_id", threshold = 0.9)
    assert(out.columns.toSeq === Seq("vec_id", "bucket", "kept"))
    assert(out.count() === 0L)
  }
}
