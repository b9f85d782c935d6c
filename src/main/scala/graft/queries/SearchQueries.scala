package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retrieval over `documents`/`embeddings` — BM25 ranked search
  * ([[graft.ops.Bm25]]) and hybrid lexical+vector fusion (reciprocal
  * rank fusion), the serving-side text counterpart of the ANN family.
  * Oracle-checked hash-exactly: BM25 contributions are quantized longs,
  * so the ranking DuckDB replays is an exact-integer comparison; RRF
  * scores are two-term fixed-order IEEE sums over exact rank integers.
  */
object SearchQueries {

  private val terms = Seq("spark", "vector", "stream", "hash")
  private val termList = terms.map(t => s"'$t'").mkString(", ")
  private val k1 = "1.2"
  private val b = "0.75"
  private val topK = 20
  private val vecQueryId = 3
  private val rrfK = "60.0"
  private val fusedK = 15

  /** The BM25 scoring pipeline as reusable oracle CTEs ending in `bm25`
    * (doc_id, n_terms, score_fp) — the top-`topK` postings-scored docs.
    */
  private val duckBm25Ctes = duckBm25CtesOver("")

  /** The same CTE chain over a doc-filtered corpus — the takedown
    * oracle recomputes BM25 over the COMPLEMENT corpus with `extra`
    * appended to the base WHERE.
    */
  private def duckBm25CtesOver(extra: String) = s"""
            d AS (
              SELECT doc_id, string_split(text, ' ') AS w
              FROM documents WHERE text IS NOT NULL$extra),
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
            contrib AS (
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
                    FROM p JOIN df USING (term) CROSS JOIN stats) p),
            bm25 AS (
              SELECT doc_id, n_terms, score_fp
              FROM (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms,
                           CAST(SUM(c) AS BIGINT) AS score_fp
                    FROM contrib GROUP BY doc_id)
              ORDER BY score_fp DESC, doc_id LIMIT $topK)"""

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
    Some(s"""WITH $duckBm25Ctes
            SELECT doc_id, n_terms, score_fp,
                   ROUND(CAST(score_fp AS DOUBLE) / 1073741824.0, 6) AS score
            FROM bm25
            ORDER BY score_fp DESC, doc_id"""),
    bench = true)

  /** Hybrid retrieval: BM25 top-20 (4-term query) fused with cosine
    * top-20 around document $vecQueryId's embedding via reciprocal rank
    * fusion — rrf = Σ 1/(60 + rank) over the legs that returned the doc.
    * The modern two-tower serving stack (lexical recall + dense recall →
    * one ranked list) in one declarative plan: each leg is the engine's
    * existing retrieval shape (postings-filtered scan / broadcast query
    * against the corpus scan), the fusion is a tiny full-outer join of
    * two top-k frames. Ranks are exact integers on both engines, so the
    * two-term RRF sum is bit-identical.
    */
  val hybridRrf = Q(
    "q_hybrid_rrf",
    (s, dir) => {
      val lex = graft.ops.Bm25.search(
          tbl(s, dir, "documents"), "doc_id", "text", terms, k1, b, topK)
        .withColumn("lex_rank", row_number().over(
          Window.orderBy(col("score_fp").desc, col("doc_id"))).cast("long"))
        .select(col("doc_id"), col("lex_rank"))
      val e = tbl(s, dir, "embeddings")
        .filter(col("embedding").isNotNull)
        .select(col("vec_id"),
          expr("transform(embedding, x -> cast(x as double))").as("v"))
        .withColumn("nrm", expr("dot_product(v, v)"))
      val q = e.filter(col("vec_id") === vecQueryId)
        .select(col("v").as("qv"), col("nrm").as("qn"))
      // top-k FIRST via TakeOrdered (partial top-k per partition, no
      // global sort), then rank within the k-row frame — the window
      // never sees the corpus
      val vec = e.crossJoin(broadcast(q))
        .withColumn("cos",
          expr("dot_product(qv, v)") / sqrt(col("qn") * col("nrm")))
        .orderBy(col("cos").desc, col("vec_id"))
        .limit(topK)
        .withColumn("vec_rank", row_number().over(
          Window.orderBy(col("cos").desc, col("vec_id"))).cast("long"))
        .select(col("vec_id").as("doc_id"), col("vec_rank"))
      lex.join(vec, Seq("doc_id"), "full_outer")
        .withColumn("rrf",
          coalesce(lit(1.0) / (lit(rrfK.toDouble) + col("lex_rank")
            .cast("double")), lit(0.0))
            + coalesce(lit(1.0) / (lit(rrfK.toDouble) + col("vec_rank")
              .cast("double")), lit(0.0)))
        .orderBy(col("rrf").desc, col("doc_id"))
        .limit(fusedK)
        .select(col("doc_id"), col("lex_rank"), col("vec_rank"),
          round(col("rrf"), 6).as("rrf"))
    },
    Some(s"""WITH $duckBm25Ctes,
            lex AS (
              SELECT doc_id,
                     CAST(ROW_NUMBER() OVER (
                       ORDER BY score_fp DESC, doc_id) AS BIGINT) AS lex_rank
              FROM bm25),
            e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                         list_sum([x * x for x in embedding::DOUBLE[]]) AS nrm
                  FROM embeddings WHERE embedding IS NOT NULL),
            q AS (SELECT v AS qv, nrm AS qn FROM e
                  WHERE vec_id = $vecQueryId),
            vec AS (
              SELECT vec_id AS doc_id, vec_rank FROM (
                SELECT e.vec_id,
                       CAST(ROW_NUMBER() OVER (ORDER BY
                         list_sum([qv[i] * v[i] for i in
                           generate_series(1, len(qv))])
                           / sqrt(qn * nrm) DESC, e.vec_id) AS BIGINT)
                         AS vec_rank
                FROM e CROSS JOIN q)
              WHERE vec_rank <= $topK),
            fused AS (
              SELECT COALESCE(lex.doc_id, vec.doc_id) AS doc_id,
                     lex_rank, vec_rank,
                     COALESCE(1.0 / ($rrfK + CAST(lex_rank AS DOUBLE)), 0.0)
                       + COALESCE(1.0 / ($rrfK + CAST(vec_rank AS DOUBLE)),
                                  0.0) AS rrf
              FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id)
            SELECT doc_id, lex_rank, vec_rank, ROUND(rrf, 6) AS rrf
            FROM fused
            ORDER BY fused.rrf DESC, doc_id LIMIT $fusedK"""),
    bench = true)

  private val mmrLambda = "0.7"
  private val mmrN = 30
  private val mmrKSel = 10
  private val mmrQueries = 4

  /** MMR diversity re-rank ([[graft.functions.MmrSelect]]): brute-force
    * cosine top-30 per query (the ANN leg's candidate shape), then the
    * greedy λ-tradeoff selection of 10 — executed map-side per query row
    * over the bounded candidate array, because MMR is sequential in k
    * and a bounded-N local loop is the correct distribution (the shuffle
    * ends at candidate generation). The oracle replays the ENTIRE greedy
    * sequence with a recursive CTE whose per-step pick is
    * `MAX(struct(score, −id, …))` — bit-identical tie-breaking — so a
    * hash-match proves all 40 picks (4 queries × 10) in order.
    */
  val mmrRerank = Q(
    "q_mmr_rerank",
    (s, dir) => {
      val e = tbl(s, dir, "embeddings")
        .filter(col("embedding").isNotNull)
        .select(col("vec_id"),
          expr("transform(embedding, x -> cast(x as double))").as("v"))
        .withColumn("nrm", expr("dot_product(v, v)"))
      val q = e.filter(col("vec_id") < mmrQueries)
        .select(col("vec_id").as("query_id"), col("v").as("qv"),
          col("nrm").as("qn"))
      val w = Window.partitionBy("query_id")
        .orderBy(col("rel").desc, col("vec_id"))
      val cand = e.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("query_id"))
        .withColumn("rel",
          expr("dot_product(qv, v)") / sqrt(col("qn") * col("nrm")))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= mmrN)
      cand.groupBy("query_id")
        .agg(collect_list(struct(col("vec_id").as("id"), col("v"),
          col("rel"))).as("cands"))
        .select(col("query_id"), posexplode(expr(
          s"mmr_select(cands, $mmrLambda, $mmrKSel)")))
        .select(col("query_id"), (col("pos") + 1).cast("long").as("mmr_rank"),
          col("col.id").as("neighbor_id"),
          round(col("col.score"), 6).as("score"))
        .orderBy("query_id", "mmr_rank")
    },
    Some(s"""WITH RECURSIVE
            e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                         list_sum([x * x for x in embedding::DOUBLE[]]) AS nrm
                  FROM embeddings WHERE embedding IS NOT NULL),
            q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM e
                  WHERE vec_id < $mmrQueries),
            scored AS (
              SELECT q.query_id, e.vec_id, e.v, e.nrm,
                     list_sum([qv[i] * v[i] for i in
                       generate_series(1, len(qv))]) / sqrt(qn * nrm) AS rel
              FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id),
            cand AS (
              SELECT query_id, vec_id, v, nrm, rel FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                  ORDER BY rel DESC, vec_id) AS rnk FROM scored)
              WHERE rnk <= $mmrN),
            rec AS (
              SELECT query_id, 0 AS step, []::BIGINT[] AS sel,
                     []::STRUCT(v DOUBLE[], nrm DOUBLE)[] AS selv,
                     CAST(NULL AS BIGINT) AS pick_id,
                     CAST(NULL AS DOUBLE) AS pick_score
              FROM q
              UNION ALL
              SELECT query_id, step + 1,
                     list_append(sel, best.id),
                     list_append(selv, {'v': best.v, 'nrm': best.nrm}),
                     best.id, best.score
              FROM (
                SELECT r.query_id, r.step, r.sel, r.selv,
                       MAX(struct_pack(
                         score := $mmrLambda * c.rel
                           - (1.0 - $mmrLambda) * COALESCE(list_max([
                               list_sum([c.v[i] * s.v[i] for i in
                                 generate_series(1, len(c.v))])
                                 / sqrt(c.nrm * s.nrm)
                               for s in r.selv]), 0.0),
                         nid := -c.vec_id, id := c.vec_id,
                         v := c.v, nrm := c.nrm)) AS best
                FROM rec r JOIN cand c ON c.query_id = r.query_id
                  AND NOT list_contains(r.sel, c.vec_id)
                WHERE r.step < $mmrKSel
                GROUP BY r.query_id, r.step, r.sel, r.selv))
            SELECT query_id, CAST(step AS BIGINT) AS mmr_rank,
                   pick_id AS neighbor_id, ROUND(pick_score, 6) AS score
            FROM rec WHERE pick_id IS NOT NULL
            ORDER BY query_id, mmr_rank"""),
    bench = true)

  /** BM25 serving AFTER a takedown: build the materialized inverted
    * index ([[graft.ops.Bm25.buildIndex]]), TAKE DOWN every document
    * with `doc_id % 97 == 3` (one forget-ledger write recording each
    * banned doc's length; zero postings files touched), then attempt to
    * RE-APPEND exactly the banned documents — the ingest guard drops
    * them, so the oracle also proves no resurrection. Probing then
    * matches DuckDB recomputing BM25 over the COMPLEMENT corpus
    * end-to-end: banned ids appear in no result, per-term df excludes
    * them (df derives from the masked postings at query time), and the
    * corpus totals n/avgdl shift exactly as a rebuild would (the ledger
    * subtraction in [[graft.ops.Bm25.readStats]]) — so every surviving
    * document's SCORE changes too, and the hash match pins all of it.
    */
  val bm25AfterTakedown = Q(
    "q_bm25_after_takedown",
    (s, dir) => {
      val docs = tbl(s, dir, "documents")
      val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
      val path = new java.io.File(
        s"spark-warehouse/graft_bm25_takedown_$tag").getAbsolutePath
      graft.ops.Bm25.buildIndex(docs, "doc_id", "text", path)
      val bannedPred = col("doc_id") % 97 === 3
      val banned = docs.filter(bannedPred)
        .select(col("doc_id").cast("long")).collect()
        .map(_.getLong(0)).toSeq
      graft.ops.Bm25.takedownIndex(s, path, "doc_id", banned)
      // resurrection attempt: re-append exactly the banned documents
      graft.ops.Bm25.appendToIndex(docs.filter(bannedPred),
        "doc_id", "text", path)
      // physical disposal through the marker-committed purge (r13):
      // postings rewrite + stats correction must stay answer-invariant
      graft.ops.Bm25.purgeIndex(s, path, "doc_id")
      graft.ops.Bm25.probeIndex(s, path, "doc_id", terms, k1, b, topK)
        .orderBy(col("score_fp").desc, col("doc_id"))
    },
    Some(s"""WITH ${duckBm25CtesOver(" AND doc_id % 97 <> 3")}
            SELECT doc_id, n_terms, score_fp,
                   ROUND(CAST(score_fp AS DOUBLE) / 1073741824.0, 6) AS score
            FROM bm25
            ORDER BY score_fp DESC, doc_id"""))

  val all: Seq[Q] = Seq(bm25, hybridRrf, mmrRerank, bm25AfterTakedown)
}
