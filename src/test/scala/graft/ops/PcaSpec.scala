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

  test("native gram_agg is bit-identical to the exploded formulation") {
    import spark.implicits._
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val d = 5
    // deterministic, sign-mixed, magnitude-mixed values; one null element
    // (id 7, j 2) and one null vector (id 41) exercise the void-cells
    // semantics on both paths
    val e = (1L to 41L).map { id =>
      id -> (0 until d).map(j =>
        math.sin(id * 31 + j * 7) * (if (j % 2 == 0) 1e3 else 1e-3))
    }.toDF("vec_id", "v")
      .withColumn("v",
        when(col("vec_id") === 41L, lit(null).cast("array<double>"))
          .otherwise(expr("""transform(v, (x, j) ->
            CASE WHEN vec_id = 7 AND j = 2
                 THEN CAST(NULL AS DOUBLE) ELSE x END)""")))
    val exploded = Pca.gramCells(e, "v", d).collect()
      .map(r => (r.getInt(0) * d + r.getInt(1)) -> r.getLong(2)).toMap
    val agged = e.agg(expr(s"gram_agg(v, $d)")).head().getSeq[Long](0)
    (0 until d * d).foreach { k =>
      assert(agged(k) === exploded.getOrElse(k, 0L), s"cell $k")
    }
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
