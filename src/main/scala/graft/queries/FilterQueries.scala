package graft.queries

import org.apache.spark.sql.functions._

import TextQueries.duckMd5num

/** Corpus-filtering operators — third curation wave: the CCNet-style LM
  * quality filter ([[graft.ops.NgramLm]]) and exact long-span self-dedup
  * ([[graft.ops.SelfDedup]]). Both oracle-checked end to end: DuckDB
  * replays LM training + scoring and the span-dedup keep rule exactly.
  */
object FilterQueries {

  private val spanLen = 6
  /** Keep/drop boundary in integer bits-per-token (corpus median ≈ 5.31). */
  private val bptKeep = 5.35

  /** Quantized bigram LM perplexity filter: train on the corpus itself,
    * score every document in integer bits-per-token, gate at
    * [[bptKeep]]. The oracle replays BOTH phases — add-one-smoothed
    * probabilities as IEEE-exact divisions, 2^30 quantization, bit-cost
    * via binary string length (never a floating log; see
    * [[graft.ops.NgramLm]] for why that makes the hash-match exact).
    */
  val lmPerplexity = Q(
    "q_lm_perplexity",
    (s, dir) => {
      val docs = tbl(s, dir, "documents")
      val m = graft.ops.NgramLm.train(docs, "doc_id", "text")
      graft.ops.NgramLm.score(docs, "doc_id", "text", m)
        .withColumn("kept", col("bits_per_token") <= bptKeep)
        .orderBy("doc_id")
    },
    Some(s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w
                        FROM documents WHERE text IS NOT NULL),
            pe AS (SELECT doc_id, w[i] AS u, w[i + 1] AS v
                   FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i
                         FROM t WHERE len(w) >= 2)),
            big AS (SELECT u, v, count(*) AS c FROM pe GROUP BY u, v),
            ctx AS (SELECT u, sum(c) AS cu FROM big GROUP BY u),
            voc AS (SELECT count(DISTINCT tok) AS v_size
                    FROM (SELECT unnest(w) AS tok FROM t)),
            scored AS (
              SELECT pe.doc_id,
                     31 - length(bin(greatest(1, CAST(floor(
                       (COALESCE(big.c, 0) + 1)::DOUBLE
                         / (COALESCE(ctx.cu, 0) + voc.v_size)
                         * 1073741824) AS BIGINT)))) AS bits
              FROM pe LEFT JOIN big ON pe.u = big.u AND pe.v = big.v
                      LEFT JOIN ctx ON pe.u = ctx.u
                      CROSS JOIN voc)
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
                   CAST(sum(bits) AS BIGINT) AS bits_sum,
                   ROUND(sum(bits)::DOUBLE / count(*), 6) AS bits_per_token,
                   ROUND(sum(bits)::DOUBLE / count(*), 6) <= $bptKeep AS kept
            FROM scored GROUP BY doc_id
            ORDER BY doc_id"""),
    bench = true)

  /** Exact long-span self-dedup: drop every document sharing an exact
    * [[spanLen]]-word span with an earlier document (keep-first). Spans
    * as 60-bit digests; `dup_of` names the smallest earlier partner.
    */
  val selfDedupGrams = Q(
    "q_selfdedup_grams",
    (s, dir) => graft.ops.SelfDedup
      .markSpans(tbl(s, dir, "documents"), "doc_id", "text", spanLen)
      .orderBy("doc_id"),
    Some(s"""WITH g AS (
              SELECT doc_id,
                     list_distinct([${duckMd5num(
      s"list_aggr(list_slice(w, i, i + ${spanLen - 1}), 'string_agg', ' ')")}
                       for i in generate_series(1, len(w) - ${spanLen - 1})]) AS gs
              FROM (SELECT doc_id, string_split(text, ' ') AS w
                    FROM documents WHERE text IS NOT NULL)
              WHERE len(w) >= $spanLen),
            ex AS (SELECT doc_id, unnest(gs) AS gram FROM g),
            firsts AS (SELECT gram, min(doc_id) AS m FROM ex GROUP BY gram),
            verdict AS (
              SELECT ex.doc_id,
                     min(CASE WHEN f.m < ex.doc_id THEN f.m END) AS dup_of
              FROM ex JOIN firsts f USING (gram) GROUP BY ex.doc_id)
            SELECT d.doc_id, v.dup_of IS NULL AS kept,
                   CAST(v.dup_of AS BIGINT) AS dup_of
            FROM documents d LEFT JOIN verdict v USING (doc_id)
            ORDER BY doc_id"""),
    bench = true)

  private val dsirK = 25

  /** DuckDB CTEs for one quantized bigram LM trained on `pred` docs. */
  private def lmModelCtes(p: String, pred: String): String =
    s"""${p}_t AS (SELECT doc_id, string_split(text, ' ') AS w
                   FROM documents WHERE text IS NOT NULL AND ($pred)),
       ${p}_pe AS (SELECT doc_id, w[i] AS u, w[i + 1] AS v
                   FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i
                         FROM ${p}_t WHERE len(w) >= 2)),
       ${p}_big AS (SELECT u, v, count(*) AS c FROM ${p}_pe GROUP BY u, v),
       ${p}_ctx AS (SELECT u, sum(c) AS cu FROM ${p}_big GROUP BY u),
       ${p}_voc AS (SELECT count(DISTINCT tok) AS v_size
                    FROM (SELECT unnest(w) AS tok FROM ${p}_t))"""

  /** DuckDB CTEs scoring `cor_pe` under the model with prefix `p`. */
  private def lmScoreCtes(p: String): String =
    s"""sc_$p AS (
         SELECT pe.doc_id,
                31 - length(bin(greatest(1, CAST(floor(
                  (COALESCE(b.c, 0) + 1)::DOUBLE
                    / (COALESCE(x.cu, 0) + v.v_size)
                    * 1073741824) AS BIGINT)))) AS bits
         FROM cor_pe pe LEFT JOIN ${p}_big b ON pe.u = b.u AND pe.v = b.v
              LEFT JOIN ${p}_ctx x ON pe.u = x.u
              CROSS JOIN ${p}_voc v),
       agg_$p AS (SELECT doc_id, count(*) AS n, sum(bits) AS bs
                  FROM sc_$p GROUP BY doc_id)"""

  /** DSIR-style data selection ([[graft.ops.NgramLm.importanceWeights]]):
    * score every corpus document under a TARGET LM (trained on the
    * in-domain slice, doc_id % 7 == 0 — the same eval-shaped slice the
    * decontamination queries use) and a RAW LM (trained on the corpus
    * itself); importance weight = integer bit saving bits_raw −
    * bits_target; select the top-[[dsirK]] by (w DESC, doc_id) with the
    * distributed [[graft.ops.GlobalRank.withRowNumber]] (no
    * single-partition window). The oracle replays BOTH model trainings,
    * both scorings, the weight join, and the rank — all in the exact
    * integer arithmetic of the quantized LM.
    */
  val dsirSelect = Q(
    "q_dsir_select",
    (s, dir) => {
      val docs = tbl(s, dir, "documents")
      val corpus = docs.filter(col("doc_id") % 7 =!= 0)
      val target = docs.filter(col("doc_id") % 7 === 0)
      val w = graft.ops.NgramLm.importanceWeights(corpus, target, "doc_id", "text")
      graft.ops.GlobalRank
        .withRowNumber(w, Seq(col("w").desc, col("doc_id")), "rnk")
        .select(col("doc_id"), col("n_bigrams"), col("w"), col("rnk"),
          (col("rnk") <= dsirK).as("selected"))
        .orderBy("doc_id")
    },
    Some(s"""WITH ${lmModelCtes("cor", "doc_id % 7 <> 0")},
            ${lmModelCtes("tgt", "doc_id % 7 = 0")},
            ${lmScoreCtes("tgt")},
            ${lmScoreCtes("cor")},
            wjoin AS (SELECT t.doc_id, t.n AS n_bigrams, (r.bs - t.bs) AS w
                      FROM agg_tgt t JOIN agg_cor r USING (doc_id)),
            ranked AS (SELECT doc_id, n_bigrams, w,
                              ROW_NUMBER() OVER (ORDER BY w DESC, doc_id) AS rnk
                       FROM wjoin)
            SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
                   CAST(w AS BIGINT) AS w, CAST(rnk AS BIGINT) AS rnk,
                   rnk <= $dsirK AS selected
            FROM ranked ORDER BY doc_id"""),
    bench = true)

  val all: Seq[Q] = Seq(lmPerplexity, selfDedupGrams, dsirSelect)
}
