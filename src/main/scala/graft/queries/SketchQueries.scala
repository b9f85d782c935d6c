package graft.queries

import org.apache.spark.sql.functions._

/** Sketch-based approximate aggregation — the 100 TB path for distinct
  * counts and quantiles, where exact answers would shuffle every value.
  * HyperLogLog counts and approximate percentiles are mergeable partial
  * states: each partition builds a constant-size sketch, the shuffle
  * carries sketches (bytes) instead of values, and the final merge is
  * associative — the shape that keeps these O(1)-per-partition at any
  * scale.
  *
  * Sketch estimates are implementation-specific, so no cross-engine
  * DuckDB oracle exists (driver records the rows-only check); accuracy
  * against the exact answers is asserted in `SketchAccuracySpec`, and the
  * exact columns emitted next to the estimates make every row
  * self-auditing.
  */
object SketchQueries {

  /** Distinct users per event type three ways: exact, HLL++
    * (approx_count_distinct), and a DataSketches HLL sketch aggregated
    * then estimated — the latter demonstrating sketch *reuse*: the same
    * binary sketch column could be stored, unioned across days, and
    * re-estimated without touching raw data.
    */
  val sketchDistinct = Q(
    "q_sketch_distinct",
    (s, dir) => tbl(s, dir, "events")
      .groupBy("event_type")
      .agg(
        countDistinct(col("user_id")).as("exact_users"),
        approx_count_distinct(col("user_id")).as("hllpp_users"),
        hll_sketch_estimate(hll_sketch_agg(col("user_id")))
          .as("datasketches_users"))
      .orderBy("event_type"),
    None)

  /** Value quantiles per event type: approx_percentile (a mergeable
    * KLL-style summary) next to the exact percentile_cont answers.
    */
  val sketchQuantiles = Q(
    "q_sketch_quantiles",
    (s, dir) => tbl(s, dir, "events")
      .groupBy("event_type")
      .agg(
        percentile_approx(col("value"),
          array(lit(0.5), lit(0.95), lit(0.99)), lit(10000))
          .as("approx_p50_p95_p99"),
        round(expr("percentile(value, array(0.5, 0.95, 0.99))")(0), 6)
          .as("exact_p50"),
        round(expr("percentile(value, array(0.5, 0.95, 0.99))")(1), 6)
          .as("exact_p95"))
      .orderBy("event_type"),
    None)

  val all: Seq[Q] = Seq(sketchDistinct, sketchQuantiles)
}
