package graft.queries

import org.apache.spark.sql.functions._

/** Statistical aggregates and edit-distance similarity — monitoring-style
  * analytics over the event stream plus a third string-similarity metric
  * (exact Levenshtein) alongside jaccard/simhash.
  */
object StatsQueries {

  /** Percentile latency/value profile per event type. Both engines use the
    * same linear-interpolation definition (Spark `percentile` ≡ DuckDB
    * `quantile_cont`).
    */
  val valuePercentiles = Q(
    "q_value_percentiles",
    (s, dir) => tbl(s, dir, "events")
      .groupBy("event_type")
      .agg(
        round(expr("percentile(value, 0.5)"), 6).as("p50"),
        round(expr("percentile(value, 0.9)"), 6).as("p90"),
        round(expr("percentile(value, 0.99)"), 6).as("p99"),
        round(min("value"), 6).as("min_v"),
        round(max("value"), 6).as("max_v"),
        cnt())
      .orderBy("event_type"),
    Some("""SELECT event_type,
                   ROUND(quantile_cont(value, 0.5), 6) AS p50,
                   ROUND(quantile_cont(value, 0.9), 6) AS p90,
                   ROUND(quantile_cont(value, 0.99), 6) AS p99,
                   ROUND(MIN(value), 6) AS min_v,
                   ROUND(MAX(value), 6) AS max_v,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY event_type ORDER BY event_type NULLS FIRST"""))

  /** Correlation / covariance between quantity and price per return flag. */
  val corrStats = Q(
    "q_corr_stats",
    (s, dir) => tbl(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        round(corr("l_quantity", "l_extendedprice"), 6).as("qty_price_corr"),
        round(covar_samp("l_quantity", "l_extendedprice"), 4).as("qty_price_covar"),
        round(stddev_samp("l_quantity"), 6).as("qty_stddev"),
        cnt())
      .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag,
                   ROUND(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
                   ROUND(covar_samp(l_quantity, l_extendedprice), 4) AS qty_price_covar,
                   ROUND(stddev_samp(l_quantity), 6) AS qty_stddev,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Near-dup edit distance over length-blocked same-language pairs —
    * the character-level similarity metric complementing token-level
    * jaccard and bit-level simhash. Integer-exact, so directly
    * oracle-safe.
    *
    * Scale treatment mirrors q_dedup_ngram_jaccard's (this is the same
    * exact-quadratic-baseline class — the sf1 sweep caught its
    * executors pinned in full-matrix DP): (a) an explicit pair bound
    * refusal; (b) pairs are reported only up to `maxDist` edits — the
    * near-dup-relevant contract — which lets Spark run the BANDED
    * O(len·maxDist) DP (`levenshtein(l, r, threshold)`) instead of the
    * full O(len²) matrix; (c) broadcast + respread so parallelism is
    * input-bound, not blocking-key-bound.
    */
  val editDistance = Q(
    "q_edit_distance",
    (s, dir) => {
      val maxDist = 24
      val docs = tbl(s, dir, "documents")
        // Spark levenshtein counts CODEPOINTS, DuckDB counts BYTES — the
        // metrics coincide exactly on single-byte text, so the oracle
        // contract scopes to it (octet_length = length ⇔ pure ASCII; a
        // no-op on the ascii corpus, pinned by the unicode gate)
        .filter(octet_length(col("text")) === length(col("text")))
        .select(col("doc_id"), col("lang"), col("n_chars"), col("text"))
      graft.ops.SkewGuard.requirePairBound(
        docs.withColumn("ch_bkt", expr("n_chars div 5")),
        Seq("lang", "ch_bkt"))
      val a = docs.select(col("doc_id").as("ai"), col("lang").as("al"),
        col("n_chars").as("an"), col("text").as("at"))
        .repartition(s.sparkContext.defaultParallelism)
      val b = docs.select(col("doc_id").as("bi"), col("lang").as("bl"),
        col("n_chars").as("bn"), col("text").as("bt"))
      a.join(broadcast(b), col("al") === col("bl") && col("ai") < col("bi") &&
          abs(col("an") - col("bn")) <= 5)
        .select(col("ai"), col("bi"),
          levenshtein(col("at"), col("bt"), maxDist)
            .cast("long").as("edit_distance"))
        .filter(col("edit_distance") =!= -1L) // banded DP: -1 = beyond cap
        .orderBy("ai", "bi")
    },
    Some("""SELECT a.doc_id AS ai, b.doc_id AS bi,
                   CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_distance
            FROM (SELECT * FROM documents
                  WHERE strlen(text) = length(text)) a
            JOIN (SELECT * FROM documents
                  WHERE strlen(text) = length(text)) b
              ON a.lang = b.lang AND a.doc_id < b.doc_id
             AND abs(a.n_chars - b.n_chars) <= 5
            WHERE levenshtein(a.text, b.text) <= 24
            ORDER BY ai, bi"""))

  /** MAD-based robust outlier detection per event type: median absolute
    * deviation (the robust spread statistic that, unlike stddev, is not
    * itself dragged by the outliers it hunts), rows flagged at
    * dev > 3·MAD. Three passes over the events scan (median → deviations
    * → flag count), with each group statistic broadcast back — the
    * textbook distributed shape since medians cannot map-side-combine.
    * Interpolated medians are the same IEEE arithmetic in both engines
    * (`percentile` ≡ `quantile_cont`).
    */
  val outliersMad = Q(
    "q_outliers_mad",
    (s, dir) => {
      val ev = tbl(s, dir, "events")
        .filter(col("value").isNotNull) // defined null semantic: excluded
        .select(col("event_type"), col("value"))
      val med = ev.groupBy("event_type")
        .agg(expr("percentile(value, 0.5)").as("med"))
      val dev = ev.join(broadcast(med), Seq("event_type"))
        .withColumn("dev", abs(col("value") - col("med")))
      val mad = dev.groupBy("event_type")
        .agg(expr("percentile(dev, 0.5)").as("mad"))
      dev.join(broadcast(mad), Seq("event_type"))
        .groupBy("event_type")
        .agg(cnt(),
          count(when(col("dev") > lit(3.0) * col("mad"), 1)).cast("long")
            .as("n_outliers"),
          round(max("med"), 6).as("med"),
          round(max("mad"), 6).as("mad"))
        .withColumn("outlier_ratio",
          round(col("n_outliers").cast("double") / col("n").cast("double"), 6))
        .orderBy("event_type")
    },
    Some("""WITH ev AS (
              SELECT event_type, value FROM events WHERE value IS NOT NULL),
            med AS (
              SELECT event_type, quantile_cont(value, 0.5) AS med
              FROM ev GROUP BY event_type),
            dev AS (
              SELECT ev.event_type, abs(value - med) AS dev, med
              FROM ev JOIN med USING (event_type)),
            mad AS (
              SELECT event_type, quantile_cont(dev, 0.5) AS mad
              FROM dev GROUP BY event_type)
            SELECT dev.event_type, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(COUNT(CASE WHEN dev > 3.0 * mad.mad THEN 1 END)
                     AS BIGINT) AS n_outliers,
                   ROUND(MAX(dev.med), 6) AS med,
                   ROUND(MAX(mad.mad), 6) AS mad,
                   ROUND(CAST(COUNT(CASE WHEN dev > 3.0 * mad.mad THEN 1 END)
                       AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
                     AS outlier_ratio
            FROM dev JOIN mad USING (event_type)
            GROUP BY dev.event_type
            ORDER BY dev.event_type NULLS FIRST"""))

  /** ANALYZE-style one-pass table profile over `events`: per column, row
    * count, null count, exact distinct count, and an in-row accuracy
    * contract for the HLL++ estimate (|approx − exact| ≤ 5%·exact — the
    * oracle expects literal TRUE, so a hash-match proves the sketch met
    * its bound, the same pattern as the sketch-estimate queries). One
    * scan: multi-column COUNT(DISTINCT) via Catalyst's expand (the
    * documented ×cols row multiplier — the standard profile trade), then
    * the wide row unpivots to the long (column, metrics) shape.
    */
  val tableProfile = Q(
    "q_table_profile",
    (s, dir) => {
      val ev = tbl(s, dir, "events")
      val wide = ev.agg(
        count(lit(1)).as("n_rows"),
        count(col("event_id")).as("nn_event_id"),
        countDistinct(col("event_id")).as("nd_event_id"),
        expr("approx_count_distinct(event_id, 0.02)").as("ad_event_id"),
        count(col("user_id")).as("nn_user_id"),
        countDistinct(col("user_id")).as("nd_user_id"),
        expr("approx_count_distinct(user_id, 0.02)").as("ad_user_id"),
        count(col("event_type")).as("nn_event_type"),
        countDistinct(col("event_type")).as("nd_event_type"),
        expr("approx_count_distinct(event_type, 0.02)").as("ad_event_type"),
        count(col("value")).as("nn_value"),
        countDistinct(col("value")).as("nd_value"),
        expr("approx_count_distinct(value, 0.02)").as("ad_value"))
      wide.select(expr(
        """stack(4,
             'event_id', n_rows, n_rows - nn_event_id, nd_event_id,
               abs(ad_event_id - nd_event_id) <= 0.05 * nd_event_id,
             'event_type', n_rows, n_rows - nn_event_type, nd_event_type,
               abs(ad_event_type - nd_event_type) <= 0.05 * nd_event_type,
             'user_id', n_rows, n_rows - nn_user_id, nd_user_id,
               abs(ad_user_id - nd_user_id) <= 0.05 * nd_user_id,
             'value', n_rows, n_rows - nn_value, nd_value,
               abs(ad_value - nd_value) <= 0.05 * nd_value)
           as (column_name, n_rows, n_null, n_distinct, approx_ok)"""))
        .orderBy("column_name")
    },
    Some("""WITH base AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
                     CAST(COUNT(event_id) AS BIGINT) AS nn_event_id,
                     CAST(COUNT(DISTINCT event_id) AS BIGINT) AS nd_event_id,
                     CAST(COUNT(event_type) AS BIGINT) AS nn_event_type,
                     CAST(COUNT(DISTINCT event_type) AS BIGINT)
                       AS nd_event_type,
                     CAST(COUNT(user_id) AS BIGINT) AS nn_user_id,
                     CAST(COUNT(DISTINCT user_id) AS BIGINT) AS nd_user_id,
                     CAST(COUNT(value) AS BIGINT) AS nn_value,
                     CAST(COUNT(DISTINCT value) AS BIGINT) AS nd_value
              FROM events)
            SELECT 'event_id' AS column_name, n_rows,
                   n_rows - nn_event_id AS n_null,
                   nd_event_id AS n_distinct, TRUE AS approx_ok FROM base
            UNION ALL
            SELECT 'event_type', n_rows, n_rows - nn_event_type,
                   nd_event_type, TRUE FROM base
            UNION ALL
            SELECT 'user_id', n_rows, n_rows - nn_user_id, nd_user_id,
                   TRUE FROM base
            UNION ALL
            SELECT 'value', n_rows, n_rows - nn_value, nd_value, TRUE
            FROM base
            ORDER BY column_name"""))

  val all: Seq[Q] = Seq(valuePercentiles, corrStats, editDistance,
    outliersMad, tableProfile)
}
