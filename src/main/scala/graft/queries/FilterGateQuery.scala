package graft.queries

import org.apache.spark.sql.functions._

import TextQueries.stopList

/** Gopher-style heuristic quality GATE with per-rule audit flags — the
  * reject-reason table a production curation pipeline emits so every
  * dropped document is explainable (and rule hit-rates are monitorable).
  * Five rules, ALL decided by exact integer comparisons (each ratio
  * threshold is cross-multiplied: `stop_hits/n < 0.05` becomes
  * `stop_hits * 20 < n` — no IEEE compare anywhere, so the two engines
  * cannot disagree at a boundary):
  *   - f_short: fewer than 15 words
  *   - f_long: more than 3000 words
  *   - f_wordlen: mean word length outside [2, 12]
  *     (letters = n_chars − (n_tokens − 1) spaces)
  *   - f_stop: stopword ratio below 5% (natural text has some)
  *   - f_rep: most frequent word above 20% of tokens (repetition), via
  *     the native one-pass `term_counts` kernel — no token shuffle
  * `accepted` = no flag fired. One map-only pass over the corpus; the
  * oracle recomputes every rule (max term frequency via unnest +
  * group-by) and expects bit-identical booleans.
  */
object FilterGateQuery {

  val filterGate = Q(
    "q_filter_gate",
    (s, dir) => {
      graft.functions.GraftFunctions.ensureRegistered(s)
      tbl(s, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("doc_id"), col("n_chars"),
          split(col("text"), " ").as("ws"))
        .select(col("doc_id"),
          size(col("ws")).cast("long").as("n_tokens"),
          (col("n_chars") - (size(col("ws")).cast("long") - 1L))
            .as("letters"),
          expr(s"size(filter(ws, w -> w in ($stopList)))").cast("long")
            .as("stop_hits"),
          expr("array_max(transform(term_counts(ws), t -> t.tf))")
            .cast("long").as("max_tf"))
        .select(col("doc_id"), col("n_tokens"),
          (col("n_tokens") < 15L).as("f_short"),
          (col("n_tokens") > 3000L).as("f_long"),
          (col("letters") < col("n_tokens") * 2L ||
            col("letters") > col("n_tokens") * 12L).as("f_wordlen"),
          (col("stop_hits") * 20L < col("n_tokens")).as("f_stop"),
          (col("max_tf") * 5L > col("n_tokens")).as("f_rep"))
        .withColumn("accepted",
          !col("f_short") && !col("f_long") && !col("f_wordlen") &&
            !col("f_stop") && !col("f_rep"))
        .orderBy("doc_id")
    },
    Some(s"""WITH d AS (
              SELECT doc_id, n_chars, string_split(text, ' ') AS ws
              FROM documents WHERE text IS NOT NULL),
            base AS (
              SELECT doc_id,
                     CAST(len(ws) AS BIGINT) AS n_tokens,
                     CAST(n_chars - (len(ws) - 1) AS BIGINT) AS letters,
                     CAST(len(list_filter(ws, w -> w in ($stopList)))
                       AS BIGINT) AS stop_hits
              FROM d),
            tf AS (
              SELECT doc_id, MAX(c) AS max_tf FROM (
                SELECT doc_id, COUNT(*) AS c
                FROM (SELECT doc_id, unnest(ws) AS w FROM d)
                GROUP BY doc_id, w)
              GROUP BY doc_id),
            flags AS (
              SELECT b.doc_id, b.n_tokens,
                     b.n_tokens < 15 AS f_short,
                     b.n_tokens > 3000 AS f_long,
                     (b.letters < b.n_tokens * 2 OR
                      b.letters > b.n_tokens * 12) AS f_wordlen,
                     b.stop_hits * 20 < b.n_tokens AS f_stop,
                     tf.max_tf * 5 > b.n_tokens AS f_rep
              FROM base b JOIN tf USING (doc_id))
            SELECT doc_id, n_tokens, f_short, f_long, f_wordlen, f_stop,
                   f_rep,
                   NOT (f_short OR f_long OR f_wordlen OR f_stop OR f_rep)
                     AS accepted
            FROM flags ORDER BY doc_id"""))

  val all: Seq[Q] = Seq(filterGate)
}
