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

  /** Exact edit distance over length-blocked same-language pairs — the
    * character-level similarity metric complementing token-level jaccard
    * and bit-level simhash. Integer-exact, so directly oracle-safe.
    */
  val editDistance = Q(
    "q_edit_distance",
    (s, dir) => {
      val docs = tbl(s, dir, "documents")
        // Spark levenshtein counts CODEPOINTS, DuckDB counts BYTES — the
        // metrics coincide exactly on single-byte text, so the oracle
        // contract scopes to it (octet_length = length ⇔ pure ASCII; a
        // no-op on the ascii corpus, pinned by the unicode gate)
        .filter(octet_length(col("text")) === length(col("text")))
        .select(col("doc_id"), col("lang"), col("n_chars"), col("text"))
      val a = docs.select(col("doc_id").as("ai"), col("lang").as("al"),
        col("n_chars").as("an"), col("text").as("at"))
      val b = docs.select(col("doc_id").as("bi"), col("lang").as("bl"),
        col("n_chars").as("bn"), col("text").as("bt"))
      a.join(b, col("al") === col("bl") && col("ai") < col("bi") &&
          abs(col("an") - col("bn")) <= 5)
        .select(col("ai"), col("bi"),
          levenshtein(col("at"), col("bt")).cast("long").as("edit_distance"))
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
            ORDER BY ai, bi"""))

  val all: Seq[Q] = Seq(valuePercentiles, corrStats, editDistance)
}
