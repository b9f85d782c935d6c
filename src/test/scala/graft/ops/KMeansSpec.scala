package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Lloyd k-means contract: refinement moves centroids to cluster means,
  * assignments converge on separated blobs, empty clusters drop, empty
  * input degrades cleanly.
  */
class KMeansSpec extends SparkSpec {

  private def frame(rows: Seq[(Long, Seq[Double])]) = {
    import spark.implicits._
    graft.functions.GraftFunctions.ensureRegistered(spark)
    rows.toDF("vec_id", "v")
      .withColumn("nrm", expr("dot_product(v, v)"))
  }

  test("two separated blobs converge to their means in two iterations") {
    // seed ids 0 and 1 land one per blob; blob A hugs (1,0), blob B (0,1)
    val corpus = frame(Seq(
      0L -> Seq(1.0, 0.0), 2L -> Seq(0.9, 0.1), 4L -> Seq(0.95, 0.05),
      1L -> Seq(0.0, 1.0), 3L -> Seq(0.1, 0.9), 5L -> Seq(0.05, 0.95)))
    val cents = KMeans.lloyd(corpus, 2, 2)
    assert(cents.map(_.id) === Seq(0L, 1L))
    val Seq(a, b) = cents
    assert(math.abs(a.v(0) - (1.0 + 0.9 + 0.95) / 3) < 1e-6, a.v)
    assert(math.abs(b.v(1) - (1.0 + 0.9 + 0.95) / 3) < 1e-6, b.v)
    val assigned = corpus
      .withColumn("bucket", VectorIndex.assignBucket(cents))
      .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    assert(assigned === Map(0L -> 0, 2L -> 0, 4L -> 0,
      1L -> 1, 3L -> 1, 5L -> 1))
  }

  test("a centroid that attracts no members drops out") {
    // seeds 0,1,2; every non-seed point (and seed 2 itself) is nearest
    // seed 0 or 1, so cluster 2 keeps only its own seed in iteration 1 —
    // shrink it to nothing by making seed 2 itself closer to seed 0
    val corpus = frame(Seq(
      0L -> Seq(1.0, 0.0),
      1L -> Seq(0.0, 1.0),
      2L -> Seq(0.99, 0.141),
      3L -> Seq(0.9, 0.05)))
    // under the seed set {0,1,2} every point keeps a home (seed 2 is its
    // own member), so iteration 1 keeps all three clusters
    val cents0 = VectorIndex.centroidsFrom(corpus, 3)
    val refined = KMeans.iterate(corpus, cents0)
    assert(refined.map(_.id).toSet === Set(0L, 1L, 2L))
    // drop seed 2's members manually: iterate over a corpus without them
    val shrunk = KMeans.iterate(
      frame(Seq(0L -> Seq(1.0, 0.0), 1L -> Seq(0.0, 1.0),
        3L -> Seq(0.9, 0.05))), refined)
    assert(shrunk.map(_.id).toSet === Set(0L, 1L),
      "centroid with zero members must drop")
  }

  test("empty corpus yields no centroids and lloyd terminates") {
    assert(KMeans.lloyd(frame(Seq.empty), 4, 3).isEmpty)
  }

  test("separated blobs reach a Lloyd fixed point: iterating converged " +
    "centroids reproduces them exactly") {
    val corpus = frame(Seq(
      0L -> Seq(1.0, 0.0), 2L -> Seq(0.9, 0.1), 4L -> Seq(0.95, 0.05),
      1L -> Seq(0.0, 1.0), 3L -> Seq(0.1, 0.9), 5L -> Seq(0.05, 0.95)))
    val converged = KMeans.lloyd(corpus, 2, 2)
    val again = KMeans.iterate(corpus, converged)
    assert(again === converged,
      "assignments are stable, so the recomputed centroids must be " +
        "bit-identical (exact fixed-point arithmetic)")
  }
}
