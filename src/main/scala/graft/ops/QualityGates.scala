package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Zero-extra-pass data-quality counters on Spark's `Observation` API.
  *
  * A validation pass over a 100 TB table costs a 100 TB read; `observe()`
  * metrics piggyback on whatever action the pipeline already runs —
  * aggregates computed inline by the same tasks, collected to the driver
  * as one row of counters. The pattern here: instrument the frame at the
  * pipeline boundary, run the intended write/aggregate, then gate on the
  * collected counters (fail the job, quarantine the batch, page someone)
  * without ever re-scanning.
  *
  * Batch only: for streams, pass the same metric columns to
  * `df.observe(name, ...)` and read them per micro-batch from
  * `StreamingQueryProgress.observedMetrics`.
  */
object QualityGates {

  /** Attach row-count, per-column null counters, and per-column
    * out-of-range counters. Returns the instrumented frame (use it in
    * place of `df`) and the Observation handle to read after the action.
    */
  def instrument(
      df: DataFrame,
      name: String,
      nullCols: Seq[String],
      rangeCols: Map[String, (Double, Double)] = Map.empty)
      : (DataFrame, Observation) = {
    val obs = Observation(name)
    val metrics: Seq[Column] =
      count(lit(1)).as("rows") +:
        (nullCols.map(c =>
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c")) ++
          rangeCols.toSeq.map { case (c, (lo, hi)) =>
            sum(when(col(c) < lo || col(c) > hi, 1L).otherwise(0L))
              .as(s"oob_$c")
          })
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }

  /** Non-zero violation counters from a completed observation (call
    * after an action ran on the instrumented frame; `obs.get` blocks
    * until then).
    */
  def violations(obs: Observation): Seq[String] =
    obs.get.collect {
      case (k, v: Long)
          if (k.startsWith("nulls_") || k.startsWith("oob_")) && v > 0 =>
        s"$k=$v"
    }.toSeq.sorted
}
