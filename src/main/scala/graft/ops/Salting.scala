package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot aggregation keys: two-stage salted aggregation.
  *
  * A hot key (one user producing 1% of 100 TB) funnels into a single
  * reducer under plain groupBy. Salting splits each key into
  * `saltBuckets` sub-keys for the first (partial) aggregate, then merges
  * the partials in a second, tiny aggregate — shuffle #1 carries the
  * skew spread over the buckets, shuffle #2 carries `buckets` rows per
  * key. Only decomposable aggregates (sum/count/min/max) qualify;
  * AQE's `skewJoin` handles the join-side equivalent automatically.
  */
object Salting {

  /** Salted sum/count aggregation: semantically identical to
    * `df.groupBy(key).agg(sum(valueCol), count(*))`.
    */
  def saltedSumCount(
      df: DataFrame,
      key: String,
      valueCol: String,
      saltBuckets: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(saltBuckets)))
    val partial = salted.groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
    partial.groupBy(col(key))
      .agg(sum("__psum").as(s"sum_$valueCol"),
        sum("__pcnt").cast("long").as("n"))
  }

  /** Salt column generator for custom pipelines: deterministic per-row
    * bucket from a hash of the whole row's key + a row-local component.
    */
  def saltCol(saltBuckets: Int, mix: Column): Column =
    pmod(hash(mix), lit(saltBuckets))
}
