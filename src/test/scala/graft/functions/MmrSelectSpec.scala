package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MmrSelectSpec extends SparkSpec {

  private def select(
      cands: Seq[(Long, Seq[Double], Double)],
      lam: Double, k: Int): Seq[(Long, Double)] = {
    import spark.implicits._
    graft.functions.GraftFunctions.ensureRegistered(spark)
    Seq(1).toDF("g")
      .withColumn("cands", typedLit(cands.map { case (id, v, rel) =>
        (id, v, rel) }))
      .selectExpr(s"mmr_select(cands, cast($lam as double), $k) as sel")
      .select(explode(col("sel")).as("s"))
      .select(col("s.id"), col("s.score"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
  }

  test("first pick is pure relevance; later picks penalize redundancy") {
    // a and b are identical vectors (cos=1); c is orthogonal with lower
    // relevance. After picking a, MMR must prefer the diverse c over the
    // duplicate b even though b is more relevant.
    val cands = Seq(
      (1L, Seq(1.0, 0.0), 0.9), // a
      (2L, Seq(1.0, 0.0), 0.8), // b — duplicate direction of a
      (3L, Seq(0.0, 1.0), 0.5)) // c — orthogonal
    val out = select(cands, 0.5, 3)
    assert(out.map(_._1) === Seq(1L, 3L, 2L))
    // scores: pick1 = λ·0.9; pick2 = λ·0.5 − (1−λ)·0; pick3 = λ·0.8 − (1−λ)·1
    assert(math.abs(out(0)._2 - 0.45) < 1e-12)
    assert(math.abs(out(1)._2 - 0.25) < 1e-12)
    assert(math.abs(out(2)._2 - (0.4 - 0.5)) < 1e-12)
  }

  test("score ties break to the lowest id") {
    val cands = Seq(
      (7L, Seq(1.0, 0.0), 0.9),
      (2L, Seq(0.0, 1.0), 0.9))
    assert(select(cands, 1.0, 2).map(_._1) === Seq(2L, 7L))
  }

  test("k larger than the candidate set selects everything once") {
    val cands = Seq((1L, Seq(1.0, 0.0), 0.9), (2L, Seq(0.0, 1.0), 0.1))
    assert(select(cands, 0.7, 10).map(_._1).sorted === Seq(1L, 2L))
  }

  test("empty candidates yield an empty selection") {
    assert(select(Seq.empty, 0.7, 5) === Seq.empty)
  }
}
