package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Sketch-based approximate aggregation — the 100 TB path for distinct
  * counts and quantiles, where exact answers would shuffle every value.
  * HyperLogLog counts and approximate percentiles are mergeable partial
  * states: each partition builds a constant-size sketch, the shuffle
  * carries sketches (bytes) instead of values, and the final merge is
  * associative — the shape that keeps these O(1)-per-partition at any
  * scale.
  *
  * Sketch estimate VALUES are implementation-specific, so they cannot be
  * hash-compared cross-engine — but their accuracy CONTRACTS can: each
  * registered query emits the group's exact answers (computed exactly in
  * Spark, recomputed by DuckDB) plus contract booleans derived from the
  * estimates, and the oracle expects literal TRUE. A hash-match is then a
  * cross-engine proof that every estimate satisfied its bound on this
  * data. The raw estimate projections remain as `*Raw` builders exercised
  * by `SketchAccuracySpec` / `KllSketchSpec`.
  */
object SketchQueries {

  /** Distinct users per event type three ways: exact, HLL++
    * (approx_count_distinct), and a DataSketches HLL sketch aggregated
    * then estimated — the latter demonstrating sketch *reuse*: the same
    * binary sketch column could be stored, unioned across days, and
    * re-estimated without touching raw data.
    *
    * Raw-estimate projection — spec surface (`SketchAccuracySpec`), not
    * oracle-registered: the estimate values are engine-specific.
    */
  def sketchDistinctRaw(
      s: org.apache.spark.sql.SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame = {
    // Deterministic accuracy contract carried in-row: both estimators are
    // deterministic algorithms over the same input, so the booleans are
    // stable. HLL++ rsd is pinned at 0.02 (not the 0.05 default): rsd is
    // a STANDARD deviation, not a bound — at the sf0.1 cardinality regime
    // (~1500 distinct) the default sketch deterministically undercounts
    // by 6.7%, while rsd=0.02 measures ≤0.7% at every SF, giving the 5%
    // contract real margin.
    def within5pct(est: Column): Column =
      abs(est.cast("double") - col("exact_users").cast("double")) <=
        col("exact_users").cast("double") * 0.05
    tbl(s, dir, "events")
      .groupBy("event_type")
      .agg(
        countDistinct(col("user_id")).as("exact_users"),
        approx_count_distinct(col("user_id"), 0.02).as("hllpp_users"),
        hll_sketch_estimate(hll_sketch_agg(col("user_id")))
          .as("datasketches_users"))
      .withColumn("hllpp_within_5pct", within5pct(col("hllpp_users")))
      .withColumn("datasketches_within_5pct", within5pct(col("datasketches_users")))
      .orderBy("event_type")
  }

  /** Oracle-checked projection of [[sketchDistinctRaw]]: the exact distinct
    * count (cross-engine verifiable) plus the accuracy-contract booleans.
    * DuckDB recomputes the exact counts and expects literal TRUE for each
    * contract column, so a hash-match IS a cross-engine proof that both
    * estimators landed within their 5% bound — the estimates themselves
    * stay out of the hash because their exact values are engine-specific.
    */
  val sketchDistinct = Q(
    "q_sketch_distinct",
    (s, dir) => sketchDistinctRaw(s, dir)
      .select(col("event_type"), col("exact_users"),
        col("hllpp_within_5pct"), col("datasketches_within_5pct"))
      .orderBy("event_type"),
    Some("""SELECT event_type,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
                   TRUE AS hllpp_within_5pct,
                   TRUE AS datasketches_within_5pct
            FROM events GROUP BY event_type ORDER BY event_type NULLS FIRST"""))

  /** Value quantiles per event type: approx_percentile (a mergeable
    * KLL-style summary) next to the exact percentile answers.
    *
    * Scalar columns only — the driver's pandas comparator sorts rows and
    * cannot hash array cells, so the three approximate quantiles are split
    * into `approx_p50/p95/p99` doubles. The in-row booleans pin the
    * rank contract deterministically: approximate quantiles must be
    * monotone and inside the group's [min, max] value range (value
    * closeness to the interpolated exact percentile is NOT asserted —
    * approx_percentile returns actual elements, `percentile` interpolates).
    */
  def sketchQuantilesRaw(
      s: org.apache.spark.sql.SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame = tbl(s, dir, "events")
    .groupBy("event_type")
    .agg(
      percentile_approx(col("value"),
        array(lit(0.5), lit(0.95), lit(0.99)), lit(10000)).as("pa"),
      round(expr("percentile(value, array(0.5, 0.95, 0.99))")(0), 6)
        .as("exact_p50"),
      round(expr("percentile(value, array(0.5, 0.95, 0.99))")(1), 6)
        .as("exact_p95"),
      round(expr("percentile(value, array(0.5, 0.95, 0.99))")(2), 6)
        .as("exact_p99"),
      min(col("value")).as("min_value"),
      max(col("value")).as("max_value"))
    .select(
      col("event_type"),
      col("pa")(0).as("approx_p50"),
      col("pa")(1).as("approx_p95"),
      col("pa")(2).as("approx_p99"),
      col("exact_p50"), col("exact_p95"), col("exact_p99"),
      (col("pa")(0) <= col("pa")(1) && col("pa")(1) <= col("pa")(2))
        .as("monotone_ok"),
      (col("pa")(0) >= col("min_value") && col("pa")(2) <= col("max_value"))
        .as("in_range_ok"))
    .orderBy("event_type")

  /** Oracle-checked contract projection: exact interpolated percentiles
    * (cross-engine, 6-decimal round — Spark `percentile` and DuckDB
    * `quantile_cont` share the linear-interpolation definition) plus five
    * contract booleans the oracle expects to be literal TRUE: the approx
    * triple is monotone, inside the group's value range, and each
    * estimate's TRUE rank over the raw data sits within ±5pp of its
    * target (approx_percentile at accuracy 10000 guarantees ~0.01pp; 5pp
    * is a loose, tie-tolerant bound). Rank is computed by re-joining the
    * broadcast 5-row estimate frame to the raw values — one extra scan,
    * no second shuffle of the data.
    */
  val sketchQuantiles = Q(
    "q_sketch_quantiles",
    (s, dir) => {
      val ev = tbl(s, dir, "events").select(col("event_type"), col("value"))
      val ap = ev.groupBy("event_type")
        .agg(
          percentile_approx(col("value"),
            array(lit(0.5), lit(0.95), lit(0.99)), lit(10000)).as("pa"),
          min(col("value")).as("mn"), max(col("value")).as("mx"))
        .select(col("event_type"), col("pa")(0).as("ap50"),
          col("pa")(1).as("ap95"), col("pa")(2).as("ap99"),
          col("mn"), col("mx"))
      def rankOk(est: Column, target: Double): Column =
        abs(sum(when(col("value") <= est, 1L).otherwise(0L)).cast("double")
          / count(col("value")) - target) <= 0.05
      ev.join(broadcast(ap.withColumnRenamed("event_type", "__et")),
          col("event_type") <=> col("__et")).drop("__et")
        .groupBy("event_type", "ap50", "ap95", "ap99", "mn", "mx")
        .agg(
          round(expr("percentile(value, array(0.5, 0.95, 0.99))")(0), 6)
            .as("exact_p50"),
          round(expr("percentile(value, array(0.5, 0.95, 0.99))")(1), 6)
            .as("exact_p95"),
          round(expr("percentile(value, array(0.5, 0.95, 0.99))")(2), 6)
            .as("exact_p99"),
          rankOk(col("ap50"), 0.5).as("p50_rank_ok"),
          rankOk(col("ap95"), 0.95).as("p95_rank_ok"),
          rankOk(col("ap99"), 0.99).as("p99_rank_ok"))
        .select(col("event_type"),
          col("exact_p50"), col("exact_p95"), col("exact_p99"),
          (col("ap50") <= col("ap95") && col("ap95") <= col("ap99"))
            .as("monotone_ok"),
          (col("ap50") >= col("mn") && col("ap99") <= col("mx"))
            .as("in_range_ok"),
          col("p50_rank_ok"), col("p95_rank_ok"), col("p99_rank_ok"))
        .orderBy("event_type")
    },
    Some("""SELECT event_type,
                   CAST(ROUND(quantile_cont(value, 0.5), 6) AS DOUBLE) AS exact_p50,
                   CAST(ROUND(quantile_cont(value, 0.95), 6) AS DOUBLE) AS exact_p95,
                   CAST(ROUND(quantile_cont(value, 0.99), 6) AS DOUBLE) AS exact_p99,
                   TRUE AS monotone_ok, TRUE AS in_range_ok,
                   TRUE AS p50_rank_ok, TRUE AS p95_rank_ok,
                   TRUE AS p99_rank_ok
            FROM events GROUP BY event_type ORDER BY event_type NULLS FIRST"""))

  /** Value quantiles per event type from the engine's own KLL sketch
    * aggregate ([[graft.functions.KllSketchAgg]] on DataSketches) — the
    * mergeable, STORABLE quantile summary next to `approx_percentile`
    * (whose summary Spark keeps internal). Two passes: aggregate the
    * sketch per group, then re-join the (broadcast, 5-row) estimates to
    * compute each estimate's TRUE rank over the raw data — the in-row
    * `*_rank_ok` booleans carry the rank contract (|true rank − target| ≤
    * 5pp) against exact data, which the DuckDB oracle verifies as literal
    * TRUE next to its own exact percentiles.
    */
  val kllQuantiles = Q(
    "q_kll_quantiles",
    (s, dir) => {
      val ev = tbl(s, dir, "events").select(col("event_type"), col("value"))
      val sk = ev.groupBy("event_type")
        .agg(expr("kll_sketch_agg(value, 200)").as("sk"))
        .select(col("event_type"),
          expr("kll_sketch_quantile(sk, 0.5D)").as("kll_p50"),
          expr("kll_sketch_quantile(sk, 0.95D)").as("kll_p95"),
          expr("kll_sketch_quantile(sk, 0.99D)").as("kll_p99"))
      def rankOk(est: Column, target: Double): Column =
        abs(sum(when(col("value") <= est, 1L).otherwise(0L)).cast("double")
          / count(col("value")) - target) <= 0.05
      // Oracle-checked contract projection: the raw KLL estimates stay out
      // of the hash (randomized compaction — engine-specific values); what
      // DuckDB verifies is the exact interpolated percentiles plus literal
      // TRUE for each rank-contract boolean, so a hash-match is a
      // cross-engine proof the sketch held its rank bound on this data.
      ev.join(broadcast(sk.withColumnRenamed("event_type", "__et")),
          col("event_type") <=> col("__et")).drop("__et")
        .groupBy("event_type", "kll_p50", "kll_p95", "kll_p99")
        .agg(
          round(expr("percentile(value, array(0.5, 0.95, 0.99))")(0), 6)
            .as("exact_p50"),
          round(expr("percentile(value, array(0.5, 0.95, 0.99))")(1), 6)
            .as("exact_p95"),
          round(expr("percentile(value, array(0.5, 0.95, 0.99))")(2), 6)
            .as("exact_p99"),
          rankOk(col("kll_p50"), 0.5).as("p50_rank_ok"),
          rankOk(col("kll_p95"), 0.95).as("p95_rank_ok"),
          rankOk(col("kll_p99"), 0.99).as("p99_rank_ok"))
        .select(col("event_type"),
          col("exact_p50"), col("exact_p95"), col("exact_p99"),
          col("p50_rank_ok"), col("p95_rank_ok"), col("p99_rank_ok"))
        .orderBy("event_type")
    },
    Some("""SELECT event_type,
                   CAST(ROUND(quantile_cont(value, 0.5), 6) AS DOUBLE) AS exact_p50,
                   CAST(ROUND(quantile_cont(value, 0.95), 6) AS DOUBLE) AS exact_p95,
                   CAST(ROUND(quantile_cont(value, 0.99), 6) AS DOUBLE) AS exact_p99,
                   TRUE AS p50_rank_ok, TRUE AS p95_rank_ok,
                   TRUE AS p99_rank_ok
            FROM events GROUP BY event_type ORDER BY event_type NULLS FIRST"""))

  /** The deterministic scaffolding of the sketch family, split out into a
    * hash-matched oracle query: every EXACT column the sketch queries
    * carry in-row (distinct counts, interpolated percentiles, value
    * range) is recomputed here and checked against DuckDB. With this, the
    * no-oracle surface of the three sketch queries shrinks to literally
    * the estimates themselves — everything they are judged against is
    * cross-engine verified.
    *
    * `percentile` (Spark) and `quantile_cont` (DuckDB) share the same
    * linear-interpolation definition, so the exact quantiles hash-match
    * after a 6-decimal round; min/max/counts are exact selections.
    */
  val sketchScaffoldExact = Q(
    "q_sketch_scaffold_exact",
    (s, dir) => tbl(s, dir, "events")
      .groupBy("event_type")
      .agg(
        countDistinct(col("user_id")).as("exact_users"),
        round(expr("percentile(value, array(0.5, 0.95, 0.99))")(0), 6)
          .as("exact_p50"),
        round(expr("percentile(value, array(0.5, 0.95, 0.99))")(1), 6)
          .as("exact_p95"),
        round(expr("percentile(value, array(0.5, 0.95, 0.99))")(2), 6)
          .as("exact_p99"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"),
        cnt("n_events"))
      .orderBy("event_type"),
    Some("""SELECT event_type,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
                   CAST(ROUND(quantile_cont(value, 0.5), 6) AS DOUBLE) AS exact_p50,
                   CAST(ROUND(quantile_cont(value, 0.95), 6) AS DOUBLE) AS exact_p95,
                   CAST(ROUND(quantile_cont(value, 0.99), 6) AS DOUBLE) AS exact_p99,
                   MIN(value) AS min_value,
                   MAX(value) AS max_value,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM events GROUP BY event_type ORDER BY event_type NULLS FIRST"""))

  /** Frequent-items ("heavy hitters") sketch over per-language tokens —
    * the engine's own [[graft.functions.FreqSketchAgg]] on DataSketches:
    * one pass, O(maxMapSize) memory per group, shuffle carries sketch
    * bytes. This query is fully ORACLE-CHECKED, unlike the other sketch
    * rows: the corpus vocabulary (31 tokens/lang) sits far below the
    * 128-slot map, so the sketch never purges and Misra-Gries semantics
    * guarantee EXACT, merge-order-independent counts — DuckDB recomputes
    * the same top token (min-tiebreak, matching `freq_sketch_top1`),
    * its exact count, and a zero error bound. The eviction regime (where
    * estimates become approximate and only the lb/ub contract holds) is
    * pinned by `FreqSketchSpec` on a high-cardinality adversarial stream.
    */
  val freqItems = Q(
    "q_freq_items",
    (s, dir) => {
      val toks = tbl(s, dir, "documents")
        .filter(col("lang").isNotNull) // defined null semantic: excluded
        .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
        .filter(length(col("tok")) > 0)
      toks.groupBy("lang")
        // capacity 512 keeps Misra-Gries in its EXACT regime (vocab/lang is
        // ~130 on the ascii corpus, ~270 under the unicode gate's rewritten
        // tokens) — the oracle models the exact regime only
        .agg(expr("freq_sketch_agg(tok, 512)").as("sk"), cnt("n_tokens"))
        .select(col("lang"),
          expr("freq_sketch_top1(sk)").as("top_token"),
          expr("freq_sketch_estimate(sk, freq_sketch_top1(sk))")
            .as("top_count"),
          (expr("freq_sketch_ub(sk, freq_sketch_top1(sk))")
            - expr("freq_sketch_lb(sk, freq_sketch_top1(sk))"))
            .as("max_err"),
          col("n_tokens"))
        .orderBy("lang")
    },
    Some("""WITH toks AS (
              SELECT lang, unnest(string_split(text, ' ')) AS tok
              FROM documents WHERE lang IS NOT NULL),
            tc AS (
              SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS n
              FROM toks WHERE len(tok) > 0 GROUP BY lang, tok),
            m AS (SELECT lang, MAX(n) AS top_count FROM tc GROUP BY lang),
            tt AS (
              SELECT tc.lang, MIN(tok) AS top_token, m.top_count
              FROM tc JOIN m ON tc.lang = m.lang AND tc.n = m.top_count
              GROUP BY tc.lang, m.top_count),
            tot AS (
              SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_tokens
              FROM toks WHERE len(tok) > 0 GROUP BY lang)
            SELECT tt.lang AS lang, top_token, top_count,
                   CAST(0 AS BIGINT) AS max_err, n_tokens
            FROM tt JOIN tot ON tt.lang = tot.lang
            ORDER BY tt.lang"""))

  val all: Seq[Q] =
    Seq(sketchDistinct, sketchQuantiles, kllQuantiles, sketchScaffoldExact,
      freqItems)
}
