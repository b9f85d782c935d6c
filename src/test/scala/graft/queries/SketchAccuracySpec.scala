package graft.queries

import graft.SparkSpec

/** The sketch queries have no cross-engine oracle (estimates are
  * implementation-specific); their contract is bounded error against the
  * exact answers they emit alongside.
  */
class SketchAccuracySpec extends SparkSpec {

  test("HLL distinct estimates within 5% of exact (both HLL++ and DataSketches)") {
    val rows = SketchQueries.sketchDistinct.spark(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getLong(1).toDouble
      val hllpp = r.getLong(2).toDouble
      val ds = r.getLong(3).toDouble
      assert(math.abs(hllpp - exact) / exact <= 0.05,
        s"HLL++ off by >5%: $r")
      assert(math.abs(ds - exact) / exact <= 0.05,
        s"DataSketches off by >5%: $r")
    }
  }

  test("approx percentiles hold their rank contract (p50 within ±5pp, " +
    "p95 within ±5pp of the true rank)") {
    // approx_percentile returns an actual element while the exact
    // percentile interpolates, so compare by RANK, not by value: the
    // fraction of values ≤ the estimate must sit near the target quantile
    val rows = SketchQueries.sketchQuantiles.spark(spark, sf()).collect()
    assert(rows.nonEmpty)
    val events = tbl(spark, sf(), "events")
      .select("event_type", "value").collect()
      .groupBy(_.getString(0))
      .map { case (k, rs) => k -> rs.map(_.getDouble(1)).sorted }
    rows.foreach { r =>
      val vals = events(r.getString(0))
      val approx = r.getSeq[Double](1)
      def rankOf(v: Double) = vals.count(_ <= v).toDouble / vals.length
      assert(math.abs(rankOf(approx(0)) - 0.5) <= 0.05, s"p50 rank: $r")
      assert(math.abs(rankOf(approx(1)) - 0.95) <= 0.05, s"p95 rank: $r")
    }
  }
}
