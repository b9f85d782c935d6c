package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pca contract: fixed-point gram aggregation, power-iteration
  * convergence to the dominant direction, deterministic projection,
  * empty-input cleanliness.
  */
class PcaSpec extends SparkSpec {

  private def frame(rows: Seq[(Long, Seq[Double])]) = {
    import spark.implicits._
    rows.toDF("vec_id", "v")
  }

  test("gram cells are exact fixed-point sums") {
    val e = frame(Seq(1L -> Seq(1.5, -2.0), 2L -> Seq(0.5, 1.0)))
    val cells = Pca.gramCells(e, "v", 2).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    // g00 = 1.5² + 0.5² = 2.25 + 0.25; g01 = -3.0 + 0.5; g11 = 4.0 + 1.0
    assert(cells((0, 0)) === 2250000000L + 250000000L)
    assert(cells((0, 1)) === -3000000000L + 500000000L)
    assert(cells((1, 0)) === cells((0, 1)))
    assert(cells((1, 1)) === 4000000000L + 1000000000L)
  }

  test("power iteration finds the dominant direction") {
    // variance overwhelmingly along x
    val e = frame(Seq(1L -> Seq(3.0, 0.1), 2L -> Seq(-2.9, 0.05),
      3L -> Seq(2.8, -0.1), 4L -> Seq(0.1, 0.3)))
    val v = Pca.fitTop(e, "v", 2, iters = 4).get
    assert(math.abs(v(0)) > 0.99)
    assert(math.abs(v(0) * v(0) + v(1) * v(1) - 1.0) < 1e-9)
    val proj = Pca.project(e, "vec_id", "v", v).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // projection is the plain left-fold dot product
    assert(proj(1L) === (3.0 * v(0) + 0.1 * v(1)))
    assert(proj(2L) === (-2.9 * v(0) + 0.05 * v(1)))
  }

  test("null vectors are excluded; empty input yields None") {
    val e = frame(Seq(1L -> Seq(1.0, 0.0)))
      .union(frame(Seq(2L -> Seq(0.0)))
        .withColumn("v", lit(null).cast("array<double>")))
    val v = Pca.fitTop(e, "v", 2, iters = 2).get
    assert(Pca.project(e, "vec_id", "v", v).collect().map(_.getLong(0)).toSeq
      === Seq(1L))
    assert(Pca.fitTop(frame(Seq.empty), "v", 2, iters = 2).isEmpty)
  }
}
