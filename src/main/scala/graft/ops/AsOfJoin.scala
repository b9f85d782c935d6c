package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: attach to each left row the most recent right row (by time)
  * at or before it, within the same key — the canonical point-in-time
  * lookup Spark lacks as a built-in.
  *
  * Implementation is the union-and-window technique rather than a custom
  * physical operator: tag both sides, union the (key, ts, payload)
  * projection, and take `last_value(payload) ignore nulls` over
  * (key ordered by ts, with right rows sorting before left rows at equal
  * ts so "at or before" is inclusive). One shuffle on the key, sorted
  * within partitions — the same cost profile as a sort-merge join, with
  * no windowed state beyond the running last value. Preferred here over a
  * custom SparkPlan (guide preference (a): compose built-ins) because the
  * composition is exactly as shuffle-efficient as a bespoke operator.
  */
object AsOfJoin {

  /** @param left      left (probe) rows
    * @param right     right (reference) rows; should be unique per
    *                  (key, ts) — dedup first if not
    * @param key       equi-key column present on both sides
    * @param ts        event-time column (any orderable type) on both sides
    * @param rightCols right payload columns to attach (null when no right
    *                  row at or before the left row's ts)
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val taggedLeft = left
      .withColumn("__side", lit(1))
      .withColumn("__payload", lit(null).cast(structType(right, rightCols)))
    val taggedRight = right
      .select((Seq(col(key), col(ts)) :+
        struct(rightCols.map(col): _*).as("__payload")): _*)
      .withColumn("__side", lit(0))
    val unioned = taggedLeft.select(
      (leftCols.map(col) :+ col("__side") :+ col("__payload")): _*)
      .unionByName(taggedRight, allowMissingColumns = true)

    val w = Window.partitionBy(key)
      .orderBy(col(ts).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = unioned
      .withColumn("__asof", last("__payload", ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val out = leftCols.map(col) ++
      rightCols.map(c => col(s"__asof.$c").as(s"asof_$c"))
    joined.select(out: _*)
  }

  private def structType(df: DataFrame, cols: Seq[String]) =
    org.apache.spark.sql.types.StructType(
      cols.map(c => df.schema(c)))
}
