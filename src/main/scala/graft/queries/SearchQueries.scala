package graft.queries

import org.apache.spark.sql.functions._

/** Lexical retrieval over `documents` — BM25 ranked search
  * ([[graft.ops.Bm25]]), the text-search counterpart of the ANN query
  * family. Oracle-checked hash-exactly: contributions are quantized
  * longs, so the ranking DuckDB replays is an exact-integer comparison.
  */
object SearchQueries {

  private val terms = Seq("spark", "vector", "stream", "hash")
  private val termList = terms.map(t => s"'$t'").mkString(", ")
  private val k1 = "1.2"
  private val b = "0.75"
  private val topK = 20

  /** BM25 top-20 for a 4-term query. Plan: one corpus scan feeding the
    * native `term_counts` projection, map-side query-term filter (only
    * the query's own postings reach any exchange), broadcast df + stats,
    * long-quantized contributions summed order-free, TakeOrdered top-k
    * on the exact integer score.
    */
  val bm25 = Q(
    "q_bm25_search",
    (s, dir) => graft.ops.Bm25.search(
      tbl(s, dir, "documents"), "doc_id", "text", terms, k1, b, topK),
    Some(s"""WITH d AS (
              SELECT doc_id, string_split(text, ' ') AS w
              FROM documents WHERE text IS NOT NULL),
            stats AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(len(w)) AS BIGINT) AS sdl
              FROM d),
            p AS (
              SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT) AS tf
              FROM (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl,
                           unnest(w) AS term FROM d)
              WHERE term IN ($termList)
              GROUP BY doc_id, dl, term),
            df AS (
              SELECT term, CAST(COUNT(*) AS BIGINT) AS df
              FROM p GROUP BY term),
            scored AS (
              SELECT p.doc_id,
                     CAST(floor(
                       ln(1.0 + (nd - dfd + 0.5) / (dfd + 0.5))
                         * (tfd * (1.0 + $k1))
                         / (tfd + $k1 * (1.0 - $b + ($b * dld) / avgdl))
                         * 1073741824.0) AS BIGINT) AS c
              FROM (SELECT p.doc_id,
                           CAST(stats.n AS DOUBLE) AS nd,
                           CAST(df.df AS DOUBLE) AS dfd,
                           CAST(p.tf AS DOUBLE) AS tfd,
                           CAST(p.dl AS DOUBLE) AS dld,
                           CAST(stats.sdl AS DOUBLE) / CAST(stats.n AS DOUBLE)
                             AS avgdl
                    FROM p JOIN df USING (term) CROSS JOIN stats) p)
            SELECT doc_id, n_terms, score_fp,
                   ROUND(CAST(score_fp AS DOUBLE) / 1073741824.0, 6) AS score
            FROM (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms,
                         CAST(SUM(c) AS BIGINT) AS score_fp
                  FROM scored GROUP BY doc_id)
            ORDER BY score_fp DESC, doc_id LIMIT $topK"""),
    bench = true)

  val all: Seq[Q] = Seq(bm25)
}
