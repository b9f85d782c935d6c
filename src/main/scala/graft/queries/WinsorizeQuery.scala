package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Per-group winsorization — clip `value` to its group's [p05, p95] —
  * the standard heavy-tail cleanup before training-statistics
  * aggregation (a robust alternative to dropping outliers:
  * `q_outliers_mad` flags them, this op bounds them). Two passes over
  * the metric column: one keyed aggregate for the exact group
  * percentiles (Spark `percentile` ≡ DuckDB `quantile_cont`, the
  * linear-interpolation identity already pinned by
  * `q_value_percentiles`), broadcast back, then one map-side clip +
  * keyed aggregate. The clipped mean goes through the exact-decimal
  * discipline (DECIMAL(18,6) sum, round, cast) so it is
  * partition-order-free and hash-identical cross-engine; the clip
  * counts are exact integers.
  */
object WinsorizeQuery {

  val winsorize = Q(
    "q_winsorize",
    (s, dir) => {
      val ev = tbl(s, dir, "events").filter(col("value").isNotNull)
      // null-safe group join: a NULL event_type is a legitimate group
      // (null mirror) — the oracle joins with IS NOT DISTINCT FROM, so
      // the Spark side must use <=> (a plain equi-join drops null keys)
      val stats = ev.groupBy("event_type")
        .agg(expr("percentile(value, 0.05)").as("p05"),
          expr("percentile(value, 0.95)").as("p95"))
        .withColumnRenamed("event_type", "et2")
      ev.join(broadcast(stats), col("event_type") <=> col("et2"))
        .drop("et2")
        .withColumn("clipped",
          when(col("value") < col("p05"), col("p05"))
            .when(col("value") > col("p95"), col("p95"))
            .otherwise(col("value")))
        .groupBy("event_type")
        .agg(cnt(),
          sum(when(col("value") < col("p05"), 1L).otherwise(0L))
            .as("n_clip_low"),
          sum(when(col("value") > col("p95"), 1L).otherwise(0L))
            .as("n_clip_high"),
          round(sum(col("clipped").cast(DecimalType(18, 6))), 4)
            .cast("double").as("clipped_sum"))
        .orderBy(col("event_type").asc_nulls_first)
    },
    Some("""WITH ev AS (
              SELECT event_type, value FROM events WHERE value IS NOT NULL),
            st AS (
              SELECT event_type,
                     quantile_cont(value, 0.05) AS p05,
                     quantile_cont(value, 0.95) AS p95
              FROM ev GROUP BY event_type),
            c AS (
              SELECT ev.event_type, ev.value, st.p05, st.p95,
                     CASE WHEN ev.value < st.p05 THEN st.p05
                          WHEN ev.value > st.p95 THEN st.p95
                          ELSE ev.value END AS clipped
              FROM ev JOIN st ON ev.event_type IS NOT DISTINCT FROM
                                 st.event_type)
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN value < p05 THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_clip_low,
                   CAST(SUM(CASE WHEN value > p95 THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_clip_high,
                   CAST(ROUND(SUM(CAST(clipped AS DECIMAL(18,6))), 4)
                     AS DOUBLE) AS clipped_sum
            FROM c GROUP BY event_type
            ORDER BY event_type NULLS FIRST"""))

  val all: Seq[Q] = Seq(winsorize)
}
