package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import TextQueries.duckMd5num

/** Corpus-curation operators — the second wave of training-data-pipeline
  * surface: exact-snippet decontamination, semantic (embedding-space)
  * deduplication, chunk-level cross-document dedup, balanced shard
  * export, and mergeable-sketch reuse. All deterministic, all
  * oracle-checked.
  */
object CurationQueries {

  private val nGram = 5
  private[queries] val nClusters = 16
  private[queries] val cosThreshold = 0.4
  private val nShards = 8

  /** SemDeDup's scale knob, made adaptive: cluster count grows with the
    * corpus so the EXPECTED cluster size stays ~[[semTargetBucket]] and
    * the per-cluster quadratic stays linear-in-n overall (Σ size² ≈
    * n × target). A fixed k is the classic SemDeDup scaling bug — bucket
    * occupancy grows ∝ n and candidate pairs ∝ n²; the 5-point r9 scale
    * curve caught exactly that (SkewGuard refused 2.5e9 pairs at sf10).
    * Deterministic from the non-null corpus count, and replayed by the
    * oracle with the same integer arithmetic, so results hash-match at
    * every scale factor.
    */
  private[queries] val semTargetBucket = 512L
  private[queries] def semClusters(nVecs: Long): Int =
    math.max(nClusters.toLong,
      (nVecs + semTargetBucket - 1) / semTargetBucket).toInt

  private[queries] val duckCorpus =
    """SELECT vec_id, embedding::DOUBLE[] AS v,
              list_sum([x * x for x in embedding::DOUBLE[]]) AS nrm
       FROM embeddings WHERE embedding IS NOT NULL"""

  private[queries] def duckDot(a: String, b: String) =
    s"list_sum([$a[i] * $b[i] for i in generate_series(1, len($a))])"

  /** Exact n-gram decontamination ([[graft.ops.Decontaminate.exactGramHits]]):
    * corpus docs (doc_id % 7 != 0) sharing at least one exact 5-gram with
    * any eval doc (doc_id % 7 == 0). The eval gram set is broadcast; the
    * corpus probes it map-side, and only matching (doc, gram) pairs reach
    * the per-doc count shuffle — shuffle bytes scale with contamination
    * found, not corpus size. Complements `q_decontaminate` (minhash
    * near-dup): this rule catches verbatim eval snippets quoted inside
    * otherwise-unrelated documents, which a document-level Jaccard
    * threshold never fires on.
    */
  val decontaminateExact = Q(
    "q_decontaminate_exact",
    (s, dir) => {
      val docs = tbl(s, dir, "documents")
      graft.ops.Decontaminate.exactGramHits(
          docs.filter(col("doc_id") % 7 =!= 0),
          docs.filter(col("doc_id") % 7 === 0),
          "doc_id", "text", n = nGram)
        .orderBy("doc_id")
    },
    Some(s"""WITH g AS (
              -- grams as 60-bit md5-prefix digests, mirroring the native
              -- shingle_hashes kernel (hash identity with md5num)
              SELECT doc_id,
                     list_distinct([${duckMd5num(
      s"list_aggr(list_slice(w, i, i + ${nGram - 1}), 'string_agg', ' ')")}
                       for i in generate_series(1, len(w) - ${nGram - 1})]) AS gs
              FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
              WHERE len(w) >= $nGram),
            ex AS (SELECT doc_id, len(gs) AS n_grams, unnest(gs) AS gram FROM g),
            ev AS (SELECT DISTINCT gram FROM ex WHERE doc_id % 7 = 0)
            SELECT ex.doc_id, CAST(ex.n_grams AS BIGINT) AS n_grams,
                   CAST(COUNT(*) AS BIGINT) AS n_hit_grams,
                   ROUND(COUNT(*)::DOUBLE / ex.n_grams, 6) AS hit_ratio
            FROM ex JOIN ev USING (gram)
            WHERE ex.doc_id % 7 <> 0
            GROUP BY ex.doc_id, ex.n_grams
            ORDER BY doc_id"""),
    bench = true)

  /** SemDeDup-style semantic dedup ([[graft.ops.SemanticDedup]]): coarse
    * k-means-style clustering (the IVF centroid rule — lowest-k vec_ids,
    * model state folded into a map-only projection), then within each
    * cluster drop every vector with an earlier near-identical neighbor
    * (cosine ≥ 0.4). The per-cluster quadratic is the SemDeDup design
    * point — cluster count is the knob that bounds it, so k scales with
    * the corpus ([[semClusters]]: expected cluster size stays ~512 and
    * total pairs stay linear in n), and `SkewGuard.requirePairBound`
    * remains the hard budget gate. The oracle replays the adaptive k,
    * assignment, and the keep rule exactly (argmax tie-break on lowest
    * centroid id, double-precision left-to-right dot products).
    */
  val semanticDedup = Q(
    "q_semantic_dedup",
    (s, dir) => {
      val e = tbl(s, dir, "embeddings")
        .filter(col("embedding").isNotNull) // defined null semantic: excluded
        .select(col("vec_id"),
          expr("transform(embedding, x -> cast(x as double))").as("v"))
        .withColumn("nrm", expr("dot_product(v, v)"))
      val cents = graft.ops.VectorIndex.centroidsFrom(
        e, semClusters(e.count()))
      val assigned = e.withColumn(
        "bucket", graft.ops.VectorIndex.assignBucket(cents))
      graft.ops.SemanticDedup.mark(assigned, "vec_id", cosThreshold)
        .select(col("vec_id"), col("bucket").cast("long").as("bucket"),
          col("kept"))
        .orderBy("vec_id")
    },
    Some(s"""WITH e AS ($duckCorpus),
            cent AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM e
                     WHERE vec_id < (SELECT GREATEST($nClusters,
                       (COUNT(*) + ${semTargetBucket - 1}) // $semTargetBucket)
                       FROM e)),
            assigned AS (
              SELECT vec_id, v, nrm, cid AS bucket FROM (
                SELECT e.vec_id, e.v, e.nrm, cent.cid,
                       ROW_NUMBER() OVER (PARTITION BY e.vec_id
                         ORDER BY ${duckDot("e.v", "cent.cv")}
                                    / sqrt(e.nrm * cent.cn) DESC,
                                  cent.cid) AS arn
                FROM e CROSS JOIN cent)
              WHERE arn = 1),
            dropped AS (
              SELECT DISTINCT a.vec_id
              FROM assigned a JOIN assigned b
                ON a.bucket = b.bucket AND b.vec_id < a.vec_id
              WHERE ${duckDot("a.v", "b.v")} / sqrt(a.nrm * b.nrm)
                      >= $cosThreshold)
            SELECT a.vec_id, CAST(a.bucket AS BIGINT) AS bucket,
                   d.vec_id IS NULL AS kept
            FROM assigned a LEFT JOIN dropped d ON a.vec_id = d.vec_id
            ORDER BY a.vec_id"""),
    bench = true)

  /** Chunk-level cross-document dedup: chunk every document
    * ([[graft.ops.Chunker]] 20-word windows, stride 15), dedup chunks
    * globally by content hash with deterministic keep-first
    * ((doc_id, chunk_idx) order), and report per-document survival. The
    * dedup shuffle carries (64-bit hash, doc_id, chunk_idx) — chunk TEXT
    * is projected away before the exchange, so shuffle bytes are ~24/row
    * regardless of chunk size. This is the passage-level dedup pass a
    * pipeline runs between document-level dedup and packing.
    */
  val chunkDedup = Q(
    "q_chunk_dedup",
    (s, dir) => {
      val w = Window.partitionBy("h").orderBy("doc_id", "chunk_idx")
      graft.ops.Chunker.chunk(
          tbl(s, dir, "documents").select("doc_id", "lang", "text"), "text")
        .select(col("doc_id"), col("chunk_idx"),
          expr("md5num(chunk)").as("h"))
        .withColumn("rn", row_number().over(w))
        .groupBy("doc_id")
        .agg(cnt("n_chunks"),
          sum(when(col("rn") > 1, 1L).otherwise(0L)).as("n_dup_chunks"))
        .select(col("doc_id"), col("n_chunks"), col("n_dup_chunks"),
          (col("n_chunks") - col("n_dup_chunks")).as("n_kept_chunks"))
        .orderBy("doc_id")
    },
    Some(s"""WITH w AS (
              SELECT doc_id, string_split(text, ' ') AS w FROM documents
              WHERE len(string_split(text, ' ')) > 0),
            wi AS (
              SELECT doc_id, w,
                     unnest(range(0, CAST(ceil(len(w) / 15.0) AS BIGINT))) AS i
              FROM w),
            c AS (
              SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
                     ${duckMd5num(
      "list_aggr(list_slice(w, i * 15 + 1, i * 15 + 20), 'string_agg', ' ')")}
                       AS h
              FROM wi),
            r AS (
              SELECT doc_id, h,
                     ROW_NUMBER() OVER (PARTITION BY h
                       ORDER BY doc_id, chunk_idx) AS rn
              FROM c)
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
                   CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_dup_chunks,
                   CAST(COUNT(*) - SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_kept_chunks
            FROM r GROUP BY doc_id ORDER BY doc_id"""),
    bench = true)

  /** Token-balanced shard export: rank documents globally by token count
    * (descending) with [[graft.ops.GlobalRank]] — the distributed
    * replacement for a partition-less `row_number()` window, which would
    * coalesce 100 TB into one task — then deal them round-robin into 8
    * shards (longest-processing-time-first balancing). Per-shard token
    * sums land within a fraction of a percent of each other; the oracle
    * recomputes rank, deal, and balance ratio exactly.
    */
  val shardAssign = Q(
    "q_shard_assign",
    (s, dir) => {
      val docs = tbl(s, dir, "documents")
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("tokens"))
      val ranked = graft.ops.GlobalRank.withRowNumber(
        docs, Seq(col("tokens").desc, col("doc_id")), "rn")
      val shards = ranked
        .withColumn("shard", ((col("rn") - 1) % nShards).cast("long"))
        .groupBy("shard")
        .agg(cnt("n_docs"), sum(col("tokens")).as("tok_sum"))
      val total = docs.agg(sum(col("tokens")).as("total"))
      shards.crossJoin(broadcast(total))
        .select(col("shard"), col("n_docs"), col("tok_sum"),
          round(col("tok_sum") * lit(nShards.toDouble) / col("total"), 6)
            .as("balance_ratio"))
        .orderBy("shard")
    },
    Some(s"""WITH d AS (
              SELECT doc_id,
                     CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
              FROM documents),
            r AS (
              SELECT doc_id, tokens,
                     ROW_NUMBER() OVER (ORDER BY tokens DESC, doc_id) AS rn
              FROM d),
            sh AS (
              SELECT (rn - 1) % $nShards AS shard,
                     CAST(COUNT(*) AS BIGINT) AS n_docs,
                     CAST(SUM(tokens) AS BIGINT) AS tok_sum
              FROM r GROUP BY 1)
            SELECT shard, n_docs, tok_sum,
                   ROUND(tok_sum * ${nShards}.0
                     / (SELECT SUM(tok_sum) FROM sh), 6) AS balance_ratio
            FROM sh ORDER BY shard"""))

  /** Mergeable-sketch reuse: one DataSketches HLL sketch per event type
    * (the "store a sketch per day/source" pattern), then a second-level
    * union over the BINARY sketch column re-estimates the global distinct
    * count without re-touching raw data — the associative re-aggregation
    * that makes sketch stores work at 100 TB. The oracle pins the exact
    * distinct counts and expects the union's 5% accuracy contract to hold
    * (lgK=14 → ~0.4% RSE, wide margin).
    */
  val sketchUnion = Q(
    "q_sketch_union",
    (s, dir) => {
      val ev = tbl(s, dir, "events")
        .filter(col("event_type").isNotNull) // defined null semantic: excluded
      val perType = ev.groupBy("event_type")
        .agg(hll_sketch_agg(col("user_id"), lit(14)).as("sk"))
      val unioned = perType.agg(
        count(lit(1)).as("n_groups"),
        hll_sketch_estimate(hll_union_agg(col("sk"), lit(false)))
          .as("union_est"))
      val exact = ev.agg(
        countDistinct(col("user_id")).as("exact_total_users"))
      unioned.crossJoin(exact)
        .select(col("n_groups"), col("exact_total_users"),
          coalesce(
            abs(col("union_est").cast("double")
              - col("exact_total_users").cast("double"))
              <= col("exact_total_users").cast("double") * 0.05,
            col("n_groups") === 0).as("union_within_5pct"))
    },
    Some("""SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_groups,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_total_users,
                   TRUE AS union_within_5pct
            FROM events WHERE event_type IS NOT NULL"""))

  private val nFeatures = 1024
  private val hashMix = 2654435761L // Knuth multiplicative constant

  /** Fasttext-style quality classifier: a linear model over hashed word
    * bigrams (the standard cheap quality-filter architecture — hash each
    * bigram into a fixed feature table, average the feature weights, gate
    * on the sign of the logit). Weights here are derived from the feature
    * id by a fixed multiplicative hash, so the whole model is
    * deterministic and the oracle replays inference bit-for-bit — swap
    * the derived weights for trained ones in production, the execution
    * shape is identical. Map-only: one projection per document, no
    * shuffle at any scale; the sum is a left-to-right `aggregate` fold,
    * matching DuckDB's sequential list_sum.
    */
  val qualityClassifier = Q(
    "q_quality_classifier",
    (s, dir) => {
      // the weight table is MODEL STATE: a literal array the native
      // kernel indexes per hashed bigram — these derived stand-ins swap
      // for trained weights without touching the plan. Value identity
      // with the oracle: weights[f] = ((f·mix) % 2001 − 1000)/1000,
      // the exact formula DuckDB recomputes inline.
      val weights = Array.tabulate(nFeatures)(f =>
        ((f.toLong * hashMix) % 2001 - 1000) / 1000.0)
      tbl(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .filter(expr("size(w) >= 2"))
        .select(col("doc_id"),
          (size(col("w")) - 1).cast("long").as("n_feats"),
          round(call_function("bigram_logit", col("w"), typedLit(weights)), 6)
            .as("quality_logit"))
        .withColumn("keep", col("quality_logit") > 0)
        .orderBy("doc_id")
    },
    Some(s"""WITH w AS (
              SELECT doc_id, string_split(text, ' ') AS w FROM documents
              WHERE len(string_split(text, ' ')) >= 2),
            f AS (
              SELECT doc_id,
                     [${duckMd5num("w[i] || ' ' || w[i+1]")} % $nFeatures
                      for i in generate_series(1, len(w) - 1)] AS fs
              FROM w)
            SELECT doc_id, CAST(len(fs) AS BIGINT) AS n_feats,
                   ROUND(list_sum([((f * $hashMix) % 2001 - 1000) / 1000.0
                                   for f in fs]) / len(fs), 6)
                     AS quality_logit,
                   list_sum([((f * $hashMix) % 2001 - 1000) / 1000.0
                             for f in fs]) / len(fs) > 0 AS keep
            FROM f ORDER BY doc_id"""),
    bench = true)

  /** Curriculum phasing: order the corpus easy-to-hard (shortest first as
    * the difficulty proxy) and cut it into 4 phases with
    * [[graft.ops.GlobalRank.ntile]] — exact SQL NTILE semantics without
    * the single-partition window that `ntile().over(Window.orderBy(...))`
    * would plan (a guaranteed OOM at 100 TB). The oracle recomputes
    * NTILE(4) natively.
    */
  val curriculum = Q(
    "q_curriculum",
    (s, dir) => {
      val docs = tbl(s, dir, "documents")
        .filter(col("text").isNotNull) // defined null semantic: excluded
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("tokens"))
      graft.ops.GlobalRank.ntile(
          docs, Seq(col("tokens"), col("doc_id")), 4, "phase")
        .groupBy("phase")
        .agg(cnt("n_docs"), min(col("tokens")).as("tok_min"),
          max(col("tokens")).as("tok_max"),
          sum(col("tokens")).as("tok_sum"))
        .orderBy("phase")
    },
    Some("""WITH d AS (
              SELECT doc_id,
                     CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
              FROM documents WHERE text IS NOT NULL),
            t AS (
              SELECT tokens,
                     CAST(NTILE(4) OVER (ORDER BY tokens, doc_id) AS BIGINT)
                       AS phase
              FROM d)
            SELECT phase, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   MIN(tokens) AS tok_min, MAX(tokens) AS tok_max,
                   CAST(SUM(tokens) AS BIGINT) AS tok_sum
            FROM t GROUP BY phase ORDER BY phase"""))

  /** Token-budget selection ([[graft.ops.GlobalRank.withRunningTotal]]):
    * order the corpus by priority (shortest-first here) and keep documents
    * while the GLOBAL running token total stays within a budget (60% of
    * the corpus token mass). The running total is a distributed prefix
    * sum — per-partition sums, a driver-side prefix over numPartitions
    * longs, one sweep — where `SUM(x) OVER (ORDER BY ...)` would coalesce
    * 100 TB into a single partition. The oracle recomputes the cumulative
    * sum natively.
    */
  val tokenBudget = Q(
    "q_token_budget",
    (s, dir) => {
      val docs = tbl(s, dir, "documents")
        .filter(col("text").isNotNull) // defined null semantic: excluded
        .select(col("doc_id"), col("lang"),
          size(split(col("text"), " ")).cast("long").as("tokens"))
      val total = Option(docs.agg(sum(col("tokens"))).head.get(0))
        .map(_.asInstanceOf[Long]).getOrElse(0L)
      val budget = total * 6 / 10
      graft.ops.GlobalRank.withRunningTotal(
          docs, Seq(col("tokens"), col("doc_id")), "tokens", "ct")
        .filter(col("ct") <= budget)
        .groupBy("lang")
        .agg(cnt("n_docs"), sum(col("tokens")).as("tok_sum"))
        .orderBy("lang")
    },
    Some("""WITH d AS (
              SELECT doc_id, lang,
                     CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
              FROM documents WHERE text IS NOT NULL),
            r AS (
              SELECT lang, tokens,
                     SUM(tokens) OVER (ORDER BY tokens, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS ct
              FROM d)
            SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(tokens) AS BIGINT) AS tok_sum
            FROM r
            WHERE ct <= (SELECT SUM(tokens) FROM d) * 6 // 10
            GROUP BY lang ORDER BY lang NULLS FIRST"""))

  private[queries] val kmK = 8
  private[queries] val kmIters = 2

  /** One DuckDB Lloyd assignment round against centroid CTE `cin`,
    * emitting (vec_id, v, nrm, bucket, cos) as CTE `aout`.
    */
  private[queries] def duckAssign(cin: String, aout: String): String =
    s"""$aout AS (
         SELECT vec_id, v, nrm, cid AS bucket, cos FROM (
           SELECT e.vec_id, e.v, e.nrm, c.cid,
                  ${duckDot("e.v", "c.cv")} / sqrt(e.nrm * c.cn) AS cos,
                  ROW_NUMBER() OVER (PARTITION BY e.vec_id
                    ORDER BY ${duckDot("e.v", "c.cv")}
                               / sqrt(e.nrm * c.cn) DESC, c.cid) AS arn
           FROM e CROSS JOIN $cin c) WHERE arn = 1)"""

  /** One DuckDB Lloyd recompute from assignment CTE `ain`: exact
    * fixed-point (1e-9) per-dimension means, centroids as CTE `cout`.
    */
  private[queries] def duckRecompute(ain: String, cout: String): String =
    s"""${cout}_u AS (
         -- parallel unnest zips each component with its 1-based position
         SELECT bucket, unnest(v) AS val,
                unnest(generate_series(1, len(v))) AS pos
         FROM $ain),
       ${cout}_m AS (
         SELECT bucket, pos,
                CAST(SUM(CAST(floor(val * 1e9) AS BIGINT)) AS DOUBLE)
                  / 1e9 / COUNT(*) AS mu
         FROM ${cout}_u
         GROUP BY bucket, pos),
       $cout AS (
         SELECT bucket AS cid, list(mu ORDER BY pos) AS cv,
                list_sum([x * x for x in list(mu ORDER BY pos)]) AS cn
         FROM ${cout}_m GROUP BY bucket)"""

  /** Distributed Lloyd k-means ([[graft.ops.KMeans]]): k=8 clusters on
    * the embedding corpus, deterministic lowest-id seed, TWO full Lloyd
    * refinements — and the DuckDB oracle replays the TRAINING itself
    * (both assignment rounds and both exact fixed-point centroid
    * recomputes), not just the final inference. A hash-match therefore
    * proves the entire iterative trainer is deterministic and
    * cross-engine exact: assignment argmax (lowest-id tie-break), 1e-9
    * fixed-point component sums, IEEE mean division, cosine inertia.
    * Per iteration the corpus is scanned map-side against k driver-side
    * literal centroids and the shuffle carries numPartitions × k × d
    * partial sums — constant in corpus size.
    */
  val kmeans = Q(
    "q_kmeans",
    (s, dir) => {
      val e = tbl(s, dir, "embeddings")
        .filter(col("embedding").isNotNull) // defined null semantic: excluded
        .select(col("vec_id"),
          expr("transform(embedding, x -> cast(x as double))").as("v"))
        .withColumn("nrm", expr("dot_product(v, v)"))
      val cents = graft.ops.KMeans.lloyd(e, kmK, kmIters)
      if (cents.isEmpty) {
        import org.apache.spark.sql.types._
        s.createDataFrame(
          s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(Seq(StructField("cluster", LongType),
            StructField("n_members", LongType),
            StructField("mean_cos", DoubleType))))
      } else {
        val best = graft.ops.VectorIndex.bestCentroid(cents)
        e.select((-best.getField("nc")).cast("long").as("cluster"),
            best.getField("c").as("cos"))
          .groupBy("cluster")
          .agg(cnt("n_members"),
            round(sum(floor(col("cos") * lit(1e9))
                .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
              .cast("double") / lit(1e9) / count(lit(1)), 6).as("mean_cos"))
          .orderBy("cluster")
      }
    },
    Some(s"""WITH e AS ($duckCorpus),
            c0 AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM e
                   WHERE vec_id < $kmK),
            ${duckAssign("c0", "a1")},
            ${duckRecompute("a1", "c1")},
            ${duckAssign("c1", "a2")},
            ${duckRecompute("a2", "c2")},
            ${duckAssign("c2", "af")}
            SELECT bucket AS cluster, CAST(COUNT(*) AS BIGINT) AS n_members,
                   ROUND(CAST(SUM(CAST(floor(cos * 1e9) AS BIGINT)) AS DOUBLE)
                     / 1e9 / COUNT(*), 6) AS mean_cos
            FROM af GROUP BY bucket ORDER BY cluster"""),
    bench = true)

  private val ivfQueries = 8
  private val ivfProbe = 2
  private val ivfTopK = 5

  /** IVF ANN over TRAINED centroids — the trainer→index integration:
    * [[graft.ops.KMeans.lloyd]] refines the coarse quantizer, the corpus
    * buckets map-side under the trained model, query probes fan out to
    * the nProbe nearest trained centroids, and exact search runs inside
    * the probed buckets only. The oracle replays the WHOLE chain —
    * two Lloyd iterations, final bucket assignment, probe selection,
    * in-bucket top-k — so a hash-match proves training and serving
    * compose deterministically across engines. Same scale shape as
    * `q_knn_ivf` (model state as literals, broadcast probe frame, no
    * corpus shuffle before the per-query top-k).
    */
  val knnIvfKmeans = Q(
    "q_knn_ivf_kmeans",
    (s, dir) => {
      val e = tbl(s, dir, "embeddings")
        .filter(col("embedding").isNotNull) // defined null semantic: excluded
        .select(col("vec_id"),
          expr("transform(embedding, x -> cast(x as double))").as("v"))
        .withColumn("nrm", expr("dot_product(v, v)"))
      val cents = graft.ops.KMeans.lloyd(e, kmK, kmIters)
      if (cents.isEmpty) {
        import org.apache.spark.sql.types._
        s.createDataFrame(
          s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(Seq(StructField("query_id", LongType),
            StructField("rnk", LongType),
            StructField("neighbor_id", LongType),
            StructField("cosine", DoubleType))))
      } else {
        def cosTo(c: graft.ops.VectorIndex.Centroid) =
          call_function("dot_product", col("v"), typedLit(c.v)) /
            sqrt(lit(c.nrm) * col("nrm"))
        val terms = cents.map(c =>
          struct(cosTo(c).as("c"), lit(-c.id).as("nc")))
        val assigned = e.withColumn("bucket",
          (-array_max(array(terms: _*)).getField("nc")).cast("int"))
        val probes = assigned.filter(col("vec_id") < ivfQueries)
          .select(col("vec_id").as("query_id"), col("v").as("qv"),
            col("nrm").as("qn"),
            explode(slice(sort_array(array(terms: _*), asc = false),
              1, ivfProbe)).as("p"))
          .select(col("query_id"), col("qv"), col("qn"),
            (-col("p.nc")).cast("int").as("bucket"))
        val wTop = Window.partitionBy("query_id")
          .orderBy(col("cos").desc, col("vec_id"))
        assigned.join(broadcast(probes), "bucket")
          .filter(col("vec_id") =!= col("query_id"))
          .withColumn("cos",
            expr("dot_product(qv, v)") / sqrt(col("qn") * col("nrm")))
          .withColumn("rnk", row_number().over(wTop).cast("long"))
          .filter(col("rnk") <= ivfTopK)
          .select(col("query_id"), col("rnk"),
            col("vec_id").as("neighbor_id"), round(col("cos"), 6).as("cosine"))
          .orderBy("query_id", "rnk")
      }
    },
    Some(s"""WITH e AS ($duckCorpus),
            c0 AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM e
                   WHERE vec_id < $kmK),
            ${duckAssign("c0", "a1")},
            ${duckRecompute("a1", "c1")},
            ${duckAssign("c1", "a2")},
            ${duckRecompute("a2", "c2")},
            ${duckAssign("c2", "af")},
            q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM e
                  WHERE vec_id < $ivfQueries),
            pr AS (
              SELECT query_id, qv, qn, cid AS bucket FROM (
                SELECT q.query_id, q.qv, q.qn, c.cid,
                       ROW_NUMBER() OVER (PARTITION BY q.query_id
                         ORDER BY ${duckDot("q.qv", "c.cv")}
                                    / sqrt(q.qn * c.cn) DESC, c.cid) AS prn
                FROM q CROSS JOIN c2 c) WHERE prn <= $ivfProbe),
            scored AS (
              SELECT pr.query_id, a.vec_id,
                     ${duckDot("pr.qv", "a.v")} / sqrt(pr.qn * a.nrm) AS cos
              FROM pr JOIN af a
                ON a.bucket = pr.bucket AND a.vec_id <> pr.query_id),
            ranked AS (
              SELECT query_id, vec_id, cos,
                     CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY cos DESC, vec_id) AS BIGINT) AS rnk
              FROM scored)
            SELECT query_id, rnk, vec_id AS neighbor_id,
                   ROUND(cos, 6) AS cosine
            FROM ranked WHERE rnk <= $ivfTopK
            ORDER BY query_id, rnk"""),
    bench = true)

  /** Deterministic train/val/test split (80/10/10): the split key is a
    * hash of the stable document id, so membership is reproducible on
    * any cluster, any partitioning, any run — no sampled randomness to
    * version. Map-only plus one small aggregate; at 100 TB the split
    * labels are computed in the scan projection and never shuffled
    * (only the per-(lang, split) counters move).
    */
  val trainSplit = Q(
    "q_train_split",
    (s, dir) => tbl(s, dir, "documents")
      .select(col("lang"),
        size(split(col("text"), " ")).cast("long").as("tokens"),
        expr("md5num(cast(doc_id as string)) % 100").as("h"))
      .withColumn("split",
        when(col("h") < 80, "train")
          .when(col("h") < 90, "val").otherwise("test"))
      .groupBy("lang", "split")
      .agg(cnt("n_docs"), sum(col("tokens")).as("tok_sum"))
      .orderBy("lang", "split"),
    Some(s"""SELECT lang, split, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(tokens) AS BIGINT) AS tok_sum
            FROM (
              SELECT lang,
                     CASE WHEN h < 80 THEN 'train'
                          WHEN h < 90 THEN 'val' ELSE 'test' END AS split,
                     tokens
              FROM (
                SELECT lang,
                       CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens,
                       ${duckMd5num("CAST(doc_id AS VARCHAR)")} % 100 AS h
                FROM documents))
            GROUP BY lang, split ORDER BY lang NULLS FIRST, split"""))

  val all: Seq[Q] = Seq(
    decontaminateExact, semanticDedup, chunkDedup, shardAssign, sketchUnion,
    qualityClassifier, curriculum, tokenBudget, kmeans, knnIvfKmeans,
    trainSplit)
}
