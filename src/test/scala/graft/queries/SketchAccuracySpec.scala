package graft.queries

import graft.SparkSpec

/** Raw sketch-estimate projections (the registered queries hash-check only
  * exact values + contract booleans against DuckDB; the estimate VALUES are
  * engine-specific and live here): bounded error against the exact answers
  * emitted alongside.
  */
class SketchAccuracySpec extends SparkSpec {

  test("HLL distinct estimates within 5% of exact (both HLL++ and DataSketches)") {
    val rows = SketchQueries.sketchDistinctRaw(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getLong(1).toDouble
      val hllpp = r.getLong(2).toDouble
      val ds = r.getLong(3).toDouble
      assert(math.abs(hllpp - exact) / exact <= 0.05,
        s"HLL++ off by >5%: $r")
      assert(math.abs(ds - exact) / exact <= 0.05,
        s"DataSketches off by >5%: $r")
      assert(r.getBoolean(r.fieldIndex("hllpp_within_5pct")), s"flag: $r")
      assert(r.getBoolean(r.fieldIndex("datasketches_within_5pct")), s"flag: $r")
    }
  }

  test("approx percentiles hold their rank contract (p50 within ±5pp, " +
    "p95 within ±5pp of the true rank)") {
    // approx_percentile returns an actual element while the exact
    // percentile interpolates, so compare by RANK, not by value: the
    // fraction of values ≤ the estimate must sit near the target quantile
    val rows = SketchQueries.sketchQuantilesRaw(spark, sf()).collect()
    assert(rows.nonEmpty)
    val events = tbl(spark, sf(), "events")
      .select("event_type", "value").collect()
      .groupBy(_.getString(0))
      .map { case (k, rs) => k -> rs.map(_.getDouble(1)).sorted }
    rows.foreach { r =>
      val vals = events(r.getString(0))
      val p50 = r.getDouble(r.fieldIndex("approx_p50"))
      val p95 = r.getDouble(r.fieldIndex("approx_p95"))
      def rankOf(v: Double) = vals.count(_ <= v).toDouble / vals.length
      assert(math.abs(rankOf(p50) - 0.5) <= 0.05, s"p50 rank: $r")
      assert(math.abs(rankOf(p95) - 0.95) <= 0.05, s"p95 rank: $r")
      assert(r.getBoolean(r.fieldIndex("monotone_ok")), s"monotone: $r")
      assert(r.getBoolean(r.fieldIndex("in_range_ok")), s"in range: $r")
    }
  }

  test("registered contract projections report all-TRUE booleans " +
    "(what the DuckDB oracle hash-checks)") {
    for (q <- Seq(SketchQueries.sketchDistinct, SketchQueries.sketchQuantiles,
                  SketchQueries.kllQuantiles)) {
      val rows = q.spark(spark, sf()).collect()
      assert(rows.nonEmpty, q.name)
      rows.foreach { r =>
        r.schema.fields.filter(_.dataType ==
          org.apache.spark.sql.types.BooleanType).foreach { f =>
          assert(r.getBoolean(r.fieldIndex(f.name)),
            s"${q.name}.${f.name} false in $r")
        }
      }
    }
  }
}
