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

  val all: Seq[Q] = Seq(lmPerplexity, selfDedupGrams)
}
