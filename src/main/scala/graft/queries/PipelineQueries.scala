package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import TextQueries.{duckMd5num, md5numSql}

/** Training-pipeline assembly operators over `documents` — the steps
  * between a cleaned corpus and a training run: sequence packing,
  * repetition filtering, and temperature-weighted corpus mixing. All
  * deterministic, all oracle-checked.
  */
object PipelineQueries {

  private val budget = 256

  /** Sequence packing ([[graft.ops.SequencePacker]]): contiguous-fill
    * 256-token training sequences per (lang, 200-doc shard) stream. The
    * shard key is the scale story: each window sort is bounded by a
    * shard, so packing 100 TB is embarrassingly parallel across
    * (source, shard) streams — no global order, no global cumsum. The
    * oracle recomputes the exact window arithmetic (tokens-before,
    * integer-div sequence index, offset) in DuckDB.
    */
  val packSequences = Q(
    "q_pack_sequences",
    (s, dir) => {
      val docs = tbl(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          expr("doc_id div 200").as("shard"),
          size(split(col("text"), " ")).cast("long").as("tokens"))
      val packed = graft.ops.SequencePacker.pack(
        docs, "tokens", budget, Seq("lang", "shard"), Seq("doc_id"))
      graft.ops.SequencePacker
        .sequenceStats(packed, "tokens", budget, Seq("lang", "shard"))
        .select(col("lang"), col("shard"), col("seq_idx"), col("n_docs"),
          col("seq_tokens"), col("start_offset"), col("fill_ratio"))
        .orderBy("lang", "shard", "seq_idx")
    },
    Some(s"""WITH d AS (
              SELECT doc_id, lang, doc_id // 200 AS shard,
                     CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
              FROM documents),
            p AS (
              SELECT lang, shard, tokens,
                     COALESCE(CAST(SUM(tokens) OVER (
                       PARTITION BY lang, shard ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       AS BIGINT), 0) AS tb
              FROM d)
            SELECT lang, shard, tb // $budget AS seq_idx,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(tokens) AS BIGINT) AS seq_tokens,
                   MIN(tb % $budget) AS start_offset,
                   ROUND(LEAST(CAST(SUM(tokens) AS BIGINT), $budget)::DOUBLE
                     / $budget, 6) AS fill_ratio
            FROM p GROUP BY lang, shard, tb // $budget
            ORDER BY lang NULLS FIRST, shard, seq_idx"""),
    bench = true)

  /** Intra-document repetition scoring (the Gopher-style quality rule the
    * corpus gates on): fraction of duplicate 3-gram shingles per doc.
    * Map-only — one projection per document, no shuffle at any scale.
    */
  val repetition = Q(
    "q_repetition",
    (s, dir) => tbl(s, dir, "documents")
      .select(col("doc_id"), col("lang"), split(col("text"), " ").as("w"))
      .filter(expr("size(w) >= 3"))
      .select(col("doc_id"), col("lang"),
        expr("""transform(sequence(1, size(w) - 2),
                          i -> concat_ws(' ', slice(w, i, 3)))""").as("g"))
      .select(col("doc_id"), col("lang"),
        size(col("g")).cast("long").as("n_grams"),
        size(array_distinct(col("g"))).cast("long").as("n_distinct"))
      .withColumn("rep_ratio",
        round(lit(1.0) - col("n_distinct").cast("double")
          / col("n_grams").cast("double"), 6))
      .withColumn("repetitive", col("rep_ratio") > 0.2)
      .orderBy("doc_id"),
    Some("""WITH g AS (
              SELECT doc_id, lang,
                     [list_aggr(list_slice(w, i, i + 2), 'string_agg', ' ')
                      for i in generate_series(1, len(w) - 2)] AS g
              FROM (SELECT doc_id, lang, string_split(text, ' ') AS w
                    FROM documents)
              WHERE len(w) >= 3)
            SELECT doc_id, lang,
                   CAST(len(g) AS BIGINT) AS n_grams,
                   CAST(len(list_distinct(g)) AS BIGINT) AS n_distinct,
                   ROUND(1.0 - CAST(len(list_distinct(g)) AS DOUBLE)
                     / CAST(len(g) AS DOUBLE), 6) AS rep_ratio,
                   ROUND(1.0 - CAST(len(list_distinct(g)) AS DOUBLE)
                     / CAST(len(g) AS DOUBLE), 6) > 0.2 AS repetitive
            FROM g ORDER BY doc_id"""))

  /** Temperature-weighted corpus mixing (square-root sampling): keep
    * ~10·√n docs per language, so dominant languages are downsampled
    * relatively harder — the standard α=0.5 mixing rule, with the quota
    * depending only on each language's OWN count (no cross-language float
    * sum whose order could differ between engines). Selection is the
    * deterministic hash order (md5num, doc_id), so the sample is
    * reproducible on any cluster and the oracle replays it exactly.
    * Scale shape: tiny per-lang count aggregate broadcast back, then one
    * rank window per language.
    */
  val corpusMix = Q(
    "q_corpus_mix",
    (s, dir) => {
      val docs = tbl(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          expr("md5num(cast(doc_id as string))").as("hkey"))
      val quotas = docs.groupBy("lang").agg(cnt("n_l"))
        .withColumn("quota",
          least(col("n_l"),
            round(lit(10.0) * sqrt(col("n_l").cast("double"))).cast("long")))
      val w = Window.partitionBy("lang").orderBy("hkey", "doc_id")
      docs.join(broadcast(quotas), "lang")
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= col("quota"))
        .select(col("lang"), col("rn"), col("doc_id"), col("quota"))
        .orderBy("lang", "rn")
    },
    Some(s"""WITH q AS (
              SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_l,
                     LEAST(CAST(COUNT(*) AS BIGINT),
                       CAST(ROUND(10.0 * sqrt(COUNT(*)::DOUBLE)) AS BIGINT))
                       AS quota
              FROM documents GROUP BY lang),
            r AS (
              SELECT d.lang, d.doc_id,
                     CAST(ROW_NUMBER() OVER (PARTITION BY d.lang
                       ORDER BY ${duckMd5num("d.doc_id::VARCHAR")}, d.doc_id)
                       AS BIGINT) AS rn
              FROM documents d)
            SELECT r.lang, rn, doc_id, quota
            FROM r JOIN q ON r.lang = q.lang
            WHERE rn <= quota
            ORDER BY r.lang, rn"""))

  /** Weighted sampling without replacement via priority sampling
    * (Duffield–Lund–Thorup): each doc gets priority w/u with
    * u = deterministic-uniform(0,1] from its id hash, and the sample is
    * the top-k priorities — inclusion probability ∝ weight, reproducible
    * on any cluster (no RNG state). This is the selection rule that turns
    * DSIR/quality importance weights into an actual corpus subset. Here
    * w = n_chars (long docs favored). Scale shape: map-only scoring, then
    * TakeOrdered top-k — no full sort, no shuffle of the corpus. Priority
    * is one IEEE division of exact operands, so DuckDB replays it
    * bit-identically; null/zero-length docs are excluded explicitly on
    * both sides.
    */
  val weightedSample = Q(
    "q_weighted_sample",
    (s, dir) => tbl(s, dir, "documents")
      .filter(col("n_chars").isNotNull && col("n_chars") > 0)
      .select(col("doc_id"), col("lang"), col("n_chars").as("w"),
        // u in (0,1]: 20 low-order hash bits, never zero
        ((expr(md5numSql("cast(doc_id as string)")) % lit(1048576L) + lit(1L))
          .cast("double") / lit(1048576.0)).as("u"))
      .withColumn("priority", col("w").cast("double") / col("u"))
      .orderBy(col("priority").desc, col("doc_id"))
      .limit(50)
      .select(col("doc_id"), col("lang"), col("w"),
        round(col("priority"), 6).as("priority")),
    Some(s"""SELECT doc_id, lang, w, ROUND(priority, 6) AS priority
            FROM (
              SELECT doc_id, lang, n_chars AS w,
                     CAST(n_chars AS DOUBLE) /
                       ((${duckMd5num("doc_id::VARCHAR")} % 1048576 + 1)
                          ::DOUBLE / 1048576.0) AS priority
              FROM documents
              WHERE n_chars IS NOT NULL AND n_chars > 0)
            ORDER BY priority DESC, doc_id LIMIT 50"""))

  val all: Seq[Q] = Seq(packSequences, repetition, corpusMix, weightedSample)
}
