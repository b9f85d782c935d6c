package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge to Spark's `private[sql]` Expression↔Column converters.
  *
  * Spark 4 moved `Column` to the engine-agnostic sql-api module; wrapping a
  * custom Catalyst `Expression` into a `Column` now goes through
  * `classic.ExpressionUtils`, which is `private[sql]`. Exposing it from a
  * subpackage of `org.apache.spark.sql` is the standard pattern used by
  * Spark-extension libraries.
  */
package object graftshim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Wrap a custom logical plan into a DataFrame (`Dataset.ofRows` is
    * `private[sql]` in Spark 4's classic module).
    */
  def dataFrame(
      spark: classic.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : classic.DataFrame =
    classic.Dataset.ofRows(spark, plan)

  /** Wrap an RDD of InternalRows into a DataFrame without a row-level
    * conversion pass (`internalCreateDataFrame` is `private[sql]`).
    */
  /** Physical-plan string of a RUNNING streaming query, for plan asserts
    * (statelessness, broadcast joins). `explainInternal` is `private[sql]`.
    */
  def streamPlan(q: org.apache.spark.sql.streaming.StreamingQuery): String =
    q match {
      case w: execution.streaming.runtime.StreamingQueryWrapper =>
        w.streamingQuery.explainInternal(extended = false)
      case other => other.toString
    }

  def internalDataFrame(
      spark: classic.SparkSession,
      rdd: org.apache.spark.rdd.RDD[
        org.apache.spark.sql.catalyst.InternalRow],
      attrs: Seq[org.apache.spark.sql.catalyst.expressions.Attribute])
      : classic.DataFrame =
    classic.Dataset.ofRows(spark,
      org.apache.spark.sql.execution.LogicalRDD(attrs, rdd)(spark))
}
