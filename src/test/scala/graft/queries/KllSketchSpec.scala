package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** KLL sketch contract: rank accuracy of the aggregate, and the MERGE LAW
  * that makes stored sketches useful — merging per-group sketches must
  * answer global quantiles as well as one sketch built over all the data.
  */
class KllSketchSpec extends SparkSpec {

  private def ev = tbl(spark, sf(), "events")
    .select(col("event_type"), col("value"))

  test("q_kll_quantiles rank-contract booleans hold at sf0.001") {
    val rows = SketchQueries.kllQuantiles.spark(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(r.fieldIndex("p50_rank_ok")), s"p50: $r")
      assert(r.getBoolean(r.fieldIndex("p95_rank_ok")), s"p95: $r")
      assert(r.getBoolean(r.fieldIndex("p99_rank_ok")), s"p99: $r")
    }
  }

  test("merge law: kll_merge_agg over per-group sketches answers GLOBAL " +
    "quantiles within rank bounds (same contract as one global sketch)") {
    val perGroup = ev.groupBy("event_type")
      .agg(expr("kll_sketch_agg(value, 200)").as("sk"))
    val merged = perGroup
      .agg(expr("kll_merge_agg(sk, 200)").as("m"))
      .select(
        expr("kll_sketch_quantile(m, 0.5D)").as("p50"),
        expr("kll_sketch_quantile(m, 0.95D)").as("p95"))
      .head()
    val direct = ev
      .agg(expr("kll_sketch_agg(value, 200)").as("m"))
      .select(
        expr("kll_sketch_quantile(m, 0.5D)").as("p50"),
        expr("kll_sketch_quantile(m, 0.95D)").as("p95"))
      .head()

    val vals = ev.select("value").collect().map(_.getDouble(0)).sorted
    def rankOf(v: Double) = vals.count(_ <= v).toDouble / vals.length
    for ((row, label) <- Seq((merged, "merged"), (direct, "direct"))) {
      assert(math.abs(rankOf(row.getDouble(0)) - 0.5) <= 0.05,
        s"$label p50 rank off: $row")
      assert(math.abs(rankOf(row.getDouble(1)) - 0.95) <= 0.05,
        s"$label p95 rank off: $row")
    }
  }

  test("kll_sketch_rank is consistent with kll_sketch_quantile " +
    "(round-trip within sketch error)") {
    val r = ev
      .agg(expr("kll_sketch_agg(value, 200)").as("m"))
      .select(expr(
        "kll_sketch_rank(m, kll_sketch_quantile(m, 0.5D))").as("rt"))
      .head().getDouble(0)
    assert(math.abs(r - 0.5) <= 0.05, s"round-trip rank $r")
  }
}
