package graft.queries

import org.apache.spark.sql.functions._

import TextQueries.{duckMd5num, md5numSql}

/** Deduplication operators over `documents` / `embeddings` — exact,
  * MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.
  *
  * Scale design (100 TB): never all-pairs on the full corpus. Every
  * variant first reduces the candidate space with a partitionable blocking
  * key — hash group (exact), LSH band (minhash), same-language +
  * length-window (jaccard), 16-bit signature + language (simhash),
  * cluster label (embedding) — so the expensive verify step runs only on
  * candidate pairs co-located by a shuffle on the blocking key. The
  * verification is exact, so results are deterministic and oracle-checkable.
  *
  * PAIR-RECALL CONTRACT under the skew guard: buckets larger than
  * [[graft.ops.SkewGuard.DefaultCap]] are salted, and cross-salt pairs
  * inside such a bucket are NOT emitted — pair recall inside an
  * oversized bucket drops to ~1/salts while every within-salt pair
  * survives. This binds ONLY on buckets past the cap (healthy LSH
  * buckets are orders of magnitude smaller; sf0.1 max observed 237 vs
  * cap 1024, so oracle results are bit-identical at every tested SF).
  * What the trade costs is DEDUP RATE on mega-duplicate groups, never
  * the integrity of what survives: each salt group's internal pairs are
  * complete, so [[graft.ops.DedupClusters.connectedComponents]] resolves
  * an oversized bucket into AT MOST `ceil(n/cap)` internally-complete
  * clusters instead of one — a takedown/keep-one pass retains up to
  * that many representatives of the group instead of exactly one, and
  * no non-duplicate row is ever misjudged. Measured, not assumed, in
  * `SkewGuardRecallSpec` at a cap-binding scale (within-salt pair
  * completeness, pair recall ~1/salts, fragment bound). The loss is
  * observable per run via the guard's `oversized_rows` metric.
  */
object DedupQueries {

  /** 3-gram word shingle set per doc (distinct), as a DataFrame.
    *
    * The word array is materialized in its own projection first: a lambda
    * body re-evaluates its free expressions per element (higher-order
    * functions run interpreted, outside codegen CSE), so inlining
    * `split(text)` into the `transform` would cost O(words²) per document.
    * CollapseProject keeps the alias because `split` is non-cheap and
    * multi-referenced.
    */
  private def shingled(s: org.apache.spark.sql.SparkSession, dir: String) =
    tbl(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"),
        split(col("text"), " ").as("w"))
      .filter(expr("size(w) >= 3"))
      .select(col("doc_id"), col("lang"), col("n_chars"),
        expr("""array_distinct(transform(
                  sequence(1, size(w) - 2),
                  i -> concat_ws(' ', slice(w, i, 3))))""")
          .as("s"))

  private val duckShingled =
    """SELECT doc_id, lang, n_chars,
         list_distinct([list_aggr(list_slice(string_split(text, ' '), i, i + 2),
                                  'string_agg', ' ')
                        for i in generate_series(1, len(string_split(text, ' ')) - 2)]) AS s
       FROM documents
       WHERE len(string_split(text, ' ')) >= 3"""

  /** Exact dedup: group by content hash (shuffling the 32-byte hash, not
    * the document text — at 100 TB the shuffle carries hashes only).
    */
  val exact = Q(
    "q_dedup_exact",
    (s, dir) => tbl(s, dir, "documents")
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(min("doc_id").as("keeper"), cnt("n_copies"))
      .select("keeper", "n_copies", "content_hash")
      .orderBy("keeper"),
    Some("""SELECT MIN(doc_id) AS keeper, CAST(COUNT(*) AS BIGINT) AS n_copies,
                   md5(text) AS content_hash
            FROM documents GROUP BY md5(text) ORDER BY keeper"""),
    bench = true)

  /** n-gram Jaccard near-dup with blocking (same lang, length window ≤50):
    * the exact ground-truth verifier the approximate variants are judged
    * against.
    *
    * Scale shape: the join is equi on (lang, length-bucket), not lang
    * alone. A lang-only equi key with the length window as a residual
    * predicate is a per-language quadratic join — effectively all-pairs at
    * 100 TB with single-digit language counts. Bucketing `n_chars div 50`
    * and exploding side A to its own + adjacent buckets makes every true
    * pair (|an−bn| ≤ 50 ⇒ bucket distance ≤ 1) land in exactly ONE
    * (lang, bucket) hash partition: side B keeps one row per doc, side A's
    * 3 bucket values overlap B's single value exactly once, so no distinct
    * is needed and block sizes are bounded by the length distribution, not
    * the corpus.
    */
  val ngramJaccard = Q(
    "q_dedup_ngram_jaccard",
    (s, dir) => {
      val sh = shingled(s, dir)
      // This is the EXACT length-blocked baseline: candidate pairs are
      // quadratic per (lang, length-bucket) — measured ×100 per data
      // decade on the synthesized sf1 leg (1.8M → 180M). Like
      // q_dedup_embedding's per-label all-pairs, it refuses past an
      // explicit pair bound instead of melting; the 100 TB path is
      // q_dedup_minhash (LSH banding, one shuffle), which also feeds
      // q_dedup_clusters / q_canonical_docs.
      graft.ops.SkewGuard.requirePairBound(
        sh.withColumn("bkt", expr("n_chars div 50")), Seq("lang", "bkt"))
      // spread the probe side to full parallelism BEFORE the broadcast
      // join: its partition count otherwise inherits the source file
      // count (the sf1 leg ships documents as 2 files → 2 tasks carried
      // the whole quadratic verify); a broadcast join needs no key
      // clustering, so a round-robin respread is free of semantics
      val a = sh.select(col("doc_id").as("ai"), col("lang").as("al"),
        col("n_chars").as("an"), col("s").as("as_"))
        .repartition(s.sparkContext.defaultParallelism)
        .withColumn("bkt",
          explode(expr("array(an div 50 - 1, an div 50, an div 50 + 1)")))
      val b = sh.select(col("doc_id").as("bi"), col("lang").as("bl"),
        col("n_chars").as("bn"), col("s").as("bs"))
        .withColumn("bbkt", expr("bn div 50"))
      // jac >= 0.5 implies min(|A|,|B|)/max(|A|,|B|) >= 0.5, so the
      // integer size-ratio prefilter is an exact implication — it prunes
      // pairs BEFORE the O(|A|+|B|) intersect/union, never changes the
      // result, and the oracle carries the same clause.
      // broadcast(b): a sort-merge join here clusters on (lang, bucket)
      // — ~75 distinct keys — so the quadratic verify work lands on a
      // HANDFUL of tasks (observed: 2 active tasks grinding the sf1
      // leg). The build side is the shingled corpus, which is exactly
      // what requirePairBound already certified as ground-truth-sized,
      // so broadcasting it is within the baseline's contract and makes
      // parallelism input-partition-bound instead of key-bound.
      a.join(broadcast(b),
          col("al") === col("bl") && col("bkt") === col("bbkt") &&
          col("ai") < col("bi") && abs(col("an") - col("bn")) <= 50 &&
          size(col("as_")) * 2 >= size(col("bs")) &&
          size(col("bs")) * 2 >= size(col("as_")))
        .withColumn("jac",
          size(array_intersect(col("as_"), col("bs"))).cast("double")
            / size(array_union(col("as_"), col("bs"))).cast("double"))
        .filter(col("jac") >= 0.5)
        .select(col("ai"), col("bi"), round(col("jac"), 6).as("jaccard"))
        .orderBy("ai", "bi")
    },
    Some(s"""WITH sh AS ($duckShingled)
            SELECT a.doc_id AS ai, b.doc_id AS bi,
                   ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                     / CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE), 6) AS jaccard
            FROM sh a CROSS JOIN generate_series(-1, 1) AS g(d)
            JOIN sh b
              ON a.lang = b.lang
             AND (a.n_chars // 50) + d = (b.n_chars // 50)
             AND a.doc_id < b.doc_id
             AND abs(a.n_chars - b.n_chars) <= 50
             AND len(a.s) * 2 >= len(b.s)
             AND len(b.s) * 2 >= len(a.s)
            WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                    / CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE) >= 0.5
            ORDER BY ai, bi"""))

  /** MinHash + LSH near-dup — the 100 TB path. One 60-bit md5 hash per
    * shingle, from which 16 min-hash functions are derived as affine maps
    * `(a_j·h + b_j) mod (2^31−1)` (exact long arithmetic, identical in
    * DuckDB). The whole signature comes from the native codegen'd
    * [[graft.functions.MinHashSig]] expression — one allocation-free pass
    * per document instead of nested interpreted lambdas. Signatures are
    * banded 4×4; docs sharing any band land in the same LSH bucket
    * (a single groupBy shuffle on the band value — never all-pairs);
    * candidates are verified with exact Jaccard ≥ 0.5. The persisted frame
    * carries shingles + signature so banding and verify reuse one
    * scan→shingle→hash pass.
    */
  private val P = graft.functions.MinHashSig.P
  private val A = graft.functions.MinHashSig.A.toSeq
  private val B = graft.functions.MinHashSig.B.toSeq

  val minhashLsh = Q(
    "q_dedup_minhash",
    (s, dir) => {
      val sh = shingled(s, dir)
        .select(col("doc_id"), col("s"), expr("minhash_sig(s)").as("sig"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val bands = sh.select(col("doc_id"),
        posexplode(expr("transform(sequence(0, 3), b -> slice(sig, b * 4 + 1, 4))")))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bvals")
      // bucket-group instead of band self-join: ONE shuffle keyed on the
      // band value co-locates each LSH bucket; singleton buckets (the vast
      // majority) die in the size filter before any pair is materialized.
      // SkewGuard salt-splits any bucket a degenerate corpus blows past
      // the cap, so the collect buffer below is O(cap) — salt is 0
      // everywhere on healthy data and the grouping is unchanged.
      val salted = graft.ops.SkewGuard.saltOversized(
        bands, Seq("band", "bvals"), "doc_id",
        metricName = "skew_guard_minhash")
      val cands = salted
        .groupBy("band", "bvals", "salt")
        .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
        .filter(size(col("ids")) > 1)
        .select(explode(expr(
          """flatten(transform(ids, (a, i) ->
               transform(slice(ids, i + 2, size(ids)),
                         b -> struct(a AS ai, b AS bi))))""")).as("p"))
        .select(col("p.ai").as("ai"), col("p.bi").as("bi"))
        .distinct()
      val withSets = cands
        .join(sh.select(col("doc_id").as("ai"), col("s").as("as_")), "ai")
        .join(sh.select(col("doc_id").as("bi"), col("s").as("bs")), "bi")
      withSets
        .withColumn("jac",
          size(array_intersect(col("as_"), col("bs"))).cast("double")
            / size(array_union(col("as_"), col("bs"))).cast("double"))
        .filter(col("jac") >= 0.5)
        .select(col("ai"), col("bi"), round(col("jac"), 6).as("jaccard"))
        .orderBy("ai", "bi")
    },
    Some(minhashOracleOver(duckShingled)),
    bench = true)

  /** The MinHash-LSH oracle over any `sh`-shaped corpus CTE — the
    * takedown row reuses it over the COMPLEMENT corpus.
    */
  private def minhashOracleOver(shSql: String): String =
    s"""WITH sh AS ($shSql),
            based AS (
              SELECT doc_id, [${duckMd5num("x")} % $P for x in s] AS bases
              FROM sh),
            sig AS (
              SELECT doc_id,
                     [list_min([(([${A.mkString(", ")}])[j + 1] * h
                                 + ([${B.mkString(", ")}])[j + 1]) % $P
                                for h in bases])
                      for j in generate_series(0, 15)] AS sig
              FROM based),
            bands AS (
              SELECT doc_id, b AS band, list_slice(sig, b * 4 + 1, b * 4 + 4) AS bvals
              FROM sig CROSS JOIN generate_series(0, 3) AS t(b)),
            cands AS (
              SELECT DISTINCT x.doc_id AS ai, y.doc_id AS bi
              FROM bands x JOIN bands y
                ON x.band = y.band AND x.bvals = y.bvals AND x.doc_id < y.doc_id)
            SELECT ai, bi,
                   ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                     / CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE), 6) AS jaccard
            FROM cands JOIN sh a ON a.doc_id = ai JOIN sh b ON b.doc_id = bi
            WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                    / CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE) >= 0.5
            ORDER BY ai, bi"""

  /** Train/eval decontamination ([[graft.ops.Decontaminate]]): the corpus
    * (doc_id % 7 != 0) is scrubbed of near-matches to the eval slice
    * (doc_id % 7 == 0). Same minhash banding as q_dedup_minhash, but the
    * eval side is broadcast and verification runs inside the map-side
    * band probe — the corpus never shuffles; only the contaminated pairs
    * do (for the final distinct). The oracle mirrors the banding in SQL
    * and recomputes exact Jaccard over the candidate pairs.
    */
  val decontaminate = Q(
    "q_decontaminate",
    (s, dir) => {
      val docs = tbl(s, dir, "documents")
      graft.ops.Decontaminate.pairs(
          docs.filter(col("doc_id") % 7 =!= 0),
          docs.filter(col("doc_id") % 7 === 0),
          "doc_id", "text", threshold = 0.5)
        .orderBy("doc_id", "eval_id")
    },
    Some(s"""WITH sh AS ($duckShingled),
            based AS (
              SELECT doc_id, [${duckMd5num("x")} % $P for x in s] AS bases
              FROM sh),
            sig AS (
              SELECT doc_id,
                     [list_min([(([${A.mkString(", ")}])[j + 1] * h
                                 + ([${B.mkString(", ")}])[j + 1]) % $P
                                for h in bases])
                      for j in generate_series(0, 15)] AS sig
              FROM based),
            bands AS (
              SELECT doc_id, b AS band, list_slice(sig, b * 4 + 1, b * 4 + 4) AS bvals
              FROM sig CROSS JOIN generate_series(0, 3) AS t(b)),
            cands AS (
              SELECT DISTINCT x.doc_id AS di, y.doc_id AS ei
              FROM bands x JOIN bands y
                ON x.band = y.band AND x.bvals = y.bvals
              WHERE x.doc_id % 7 <> 0 AND y.doc_id % 7 = 0)
            SELECT di AS doc_id, ei AS eval_id,
                   ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                     / CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE), 6) AS jaccard
            FROM cands JOIN sh a ON a.doc_id = di JOIN sh b ON b.doc_id = ei
            WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                    / CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE) >= 0.5
            ORDER BY doc_id, eval_id"""),
    bench = true)

  /** SimHash near-dup: 16-bit majority-vote signature from per-token
    * 60-bit hashes via the native [[graft.functions.SimHash16]] kernel
    * (one pass, 16 bit counters — replaces 16 interpreted filter sweeps);
    * candidate pairs (same lang) within Hamming distance 3.
    *
    * Candidates come from Hamming-LSH banding, and the banding is
    * LOSSLESS here: the 16-bit signature splits into 4 four-bit bands, a
    * pair within Hamming distance ≤ 3 differs in ≤ 3 bands, so by
    * pigeonhole it shares at least one band — every true pair is a
    * candidate, exactly like the all-pairs scan, but from one groupBy
    * shuffle on (band, bits, lang) instead of a per-language quadratic
    * join. The oracle keeps the straightforward all-pairs formulation;
    * identical results prove the equivalence.
    */
  val simhash = Q(
    "q_dedup_simhash",
    (s, dir) => {
      // persisted: the skew-guard's bucket-size pass and the main
      // expansion both derive from this narrow (id, lang, signature) frame
      val docs = tbl(s, dir, "documents")
        // defined null semantic: no text → no signature; no lang → no
        // block (the oracle's equality predicates reject NULL anyway)
        .filter(col("text").isNotNull && col("lang").isNotNull)
        .select(col("doc_id"), col("lang"),
          expr("simhash16(split(text, ' '))").as("sh16"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val bands = docs.select(col("doc_id"), col("lang"), col("sh16"),
        posexplode(expr(
          "transform(sequence(0, 3), b -> (sh16 div cast(pow(2, b * 4) as bigint)) % 16)")))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bbits")
      // hamming-verify INSIDE the bucket expansion, before the dedup
      // shuffle: 16-bit bands are coarse, so most candidate pairs fail
      // the distance test — filtering first means the distinct() only
      // shuffles true near-dup pairs (tiny), not every bucket pair
      graft.ops.SkewGuard.saltOversized(
          bands, Seq("band", "bbits", "lang"), "doc_id",
          metricName = "skew_guard_simhash")
        .groupBy("band", "bbits", "lang", "salt")
        .agg(sort_array(collect_list(struct(col("doc_id"), col("sh16"))))
          .as("members"))
        .filter(size(col("members")) > 1)
        .select(explode(expr(
          """filter(
               flatten(transform(members, (a, i) ->
                 transform(slice(members, i + 2, size(members)),
                           b -> struct(a.doc_id AS ai, b.doc_id AS bi,
                                       bit_count(a.sh16 ^ b.sh16) AS hamming)))),
               p -> p.hamming <= 3)""")).as("p"))
        .select(col("p.ai").as("ai"), col("p.bi").as("bi"),
          col("p.hamming").cast("long").as("hamming"))
        .distinct()
        .orderBy("ai", "bi")
    },
    Some(s"""WITH toks AS (
              SELECT doc_id, lang,
                     [${duckMd5num("t")} for t in string_split(text, ' ')] AS th
              FROM documents
              WHERE text IS NOT NULL AND lang IS NOT NULL),
            docs AS (
              SELECT doc_id, lang,
                     list_sum([CASE WHEN 2 * len(list_filter(th,
                         h -> (h // (2 ** i)::BIGINT) % 2 = 1))
                       > len(th)
                       THEN (2 ** i)::BIGINT ELSE 0 END
                       for i in generate_series(0, 15)])::BIGINT AS sh16
              FROM toks)
            SELECT a.doc_id AS ai, b.doc_id AS bi,
                   CAST(bit_count(xor(a.sh16, b.sh16)) AS BIGINT) AS hamming
            FROM docs a JOIN docs b
              ON a.lang = b.lang AND a.doc_id < b.doc_id
            WHERE bit_count(xor(a.sh16, b.sh16)) <= 3
            ORDER BY ai, bi"""))

  /** Embedding-cosine near-dup GROUND-TRUTH VERIFIER: same-cluster (label)
    * blocking, exact double-precision cosine ≥ 0.4 on candidates. Norms
    * are precomputed per row so the pair step does one dot product.
    *
    * This is deliberately a per-label quadratic — the exact answer the
    * approximate scale path (`q_dedup_embedding_lsh`) is judged against —
    * and it is NOT a 100 TB plan. [[graft.ops.SkewGuard.requirePairBound]]
    * makes that contract executable: the query fails fast (one cheap count
    * aggregate, before any pair is materialized) if Σ label_count² exceeds
    * the verification budget, so no unbounded quadratic is reachable
    * without an explicit `SPARK_GRAFT_MAX_QUADRATIC_PAIRS` opt-in. See
    * SCALE.md "verifier-only" note.
    */
  val embeddingCosine = Q(
    "q_dedup_embedding",
    (s, dir) => {
      val e = tbl(s, dir, "embeddings")
        .filter(col("embedding").isNotNull) // defined null semantic: excluded
        .select(col("vec_id"), col("label"),
          expr("transform(embedding, x -> cast(x as double))").as("v"))
        .withColumn("nrm", expr("dot_product(v, v)"))
      graft.ops.SkewGuard.requirePairBound(
        tbl(s, dir, "embeddings").filter(col("embedding").isNotNull),
        Seq("label"))
      val a = e.select(col("vec_id").as("ai"), col("label").as("al"),
        col("v").as("av"), col("nrm").as("an"))
      val b = e.select(col("vec_id").as("bi"), col("label").as("bl"),
        col("v").as("bv"), col("nrm").as("bn"))
      a.join(b, col("al") === col("bl") && col("ai") < col("bi"))
        .withColumn("dot", expr("dot_product(av, bv)"))
        .withColumn("cos", col("dot") / sqrt(col("an") * col("bn")))
        .filter(col("cos") >= 0.4)
        .select(col("ai"), col("bi"), round(col("cos"), 6).as("cosine"))
        .orderBy("ai", "bi")
    },
    Some("""WITH e AS (
              SELECT vec_id, label, embedding::DOUBLE[] AS v,
                     list_sum([x * x for x in embedding::DOUBLE[]]) AS nrm
              FROM embeddings WHERE embedding IS NOT NULL)
            SELECT a.vec_id AS ai, b.vec_id AS bi,
                   ROUND(list_sum([a.v[i] * b.v[i]
                           for i in generate_series(1, len(a.v))])
                         / sqrt(a.nrm * b.nrm), 6) AS cosine
            FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
            WHERE list_sum([a.v[i] * b.v[i] for i in generate_series(1, len(a.v))])
                    / sqrt(a.nrm * b.nrm) >= 0.4
            ORDER BY ai, bi"""))

  /** Production-width SimHash: 60-bit signatures (all the bits the md5
    * prefix provides) at Hamming ≤ 5 — selective enough that survivors
    * are true near-dups (15 pairs at sf0.01 vs the 16-bit variant's
    * 7080). Banding is again LOSSLESS: 6 ten-bit bands, a pair within
    * Hamming 5 differs in ≤5 bands and must share one. Same
    * verify-inside-expansion shape as the 16-bit query.
    */
  val simhash60 = Q(
    "q_dedup_simhash60",
    (s, dir) => {
      val docs = tbl(s, dir, "documents")
        .filter(col("text").isNotNull && col("lang").isNotNull)
        .select(col("doc_id"), col("lang"),
          expr("simhash60(split(text, ' '))").as("sh"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val bands = docs.select(col("doc_id"), col("lang"), col("sh"),
        posexplode(expr(
          "transform(sequence(0, 5), b -> (sh div cast(pow(2, b * 10) as bigint)) % 1024)")))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bbits")
      graft.ops.SkewGuard.saltOversized(
          bands, Seq("band", "bbits", "lang"), "doc_id",
          metricName = "skew_guard_simhash60")
        .groupBy("band", "bbits", "lang", "salt")
        .agg(sort_array(collect_list(struct(col("doc_id"), col("sh"))))
          .as("members"))
        .filter(size(col("members")) > 1)
        .select(explode(expr(
          """filter(
               flatten(transform(members, (a, i) ->
                 transform(slice(members, i + 2, size(members)),
                           b -> struct(a.doc_id AS ai, b.doc_id AS bi,
                                       bit_count(a.sh ^ b.sh) AS hamming)))),
               p -> p.hamming <= 5)""")).as("p"))
        .select(col("p.ai").as("ai"), col("p.bi").as("bi"),
          col("p.hamming").cast("long").as("hamming"))
        .distinct()
        .orderBy("ai", "bi")
    },
    Some(s"""WITH toks AS (
              SELECT doc_id, lang,
                     [${duckMd5num("t")} for t in string_split(text, ' ')] AS th
              FROM documents
              WHERE text IS NOT NULL AND lang IS NOT NULL),
            docs AS (
              SELECT doc_id, lang,
                     CAST(list_sum([CASE WHEN 2 * len(list_filter(th,
                         h -> (h // (2 ** i)::BIGINT) % 2 = 1))
                       > len(th)
                       THEN (2 ** i)::BIGINT ELSE 0 END
                       for i in generate_series(0, 59)]) AS BIGINT) AS sh
              FROM toks)
            SELECT a.doc_id AS ai, b.doc_id AS bi,
                   CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
            FROM docs a JOIN docs b
              ON a.lang = b.lang AND a.doc_id < b.doc_id
            WHERE bit_count(xor(a.sh, b.sh)) <= 5
            ORDER BY ai, bi"""),
    bench = true)

  /** Embedding near-dup via sign-LSH blocking — the SCALE path next to
    * the per-label ground truth above: 8 independent tables of 4
    * random-hyperplane sign bits (mean-free corpus-vector differences,
    * driver-side literals), candidates = same (table, signature, label)
    * bucket — one groupBy shuffle, never a per-label quadratic join —
    * verified with the exact cosine INSIDE the bucket expansion (native
    * dot_product works inside the lambda), so only true pairs reach the
    * distinct, so precision is exactly 1 by construction.
    *
    * Honest regime note: this corpus's most-similar pairs sit near
    * cos 0.45 (θ≈63°), where a 4-bit table collides with probability
    * (1−θ/π)⁴ ≈ 0.18 — eight tables amplify that to ≈0.8 expected
    * recall, measured in RecallSpec. On true near-duplicate data
    * (cos ≥ 0.9, θ ≤ 26°) the same plan reaches per-table 0.54 /
    * eight-table 0.998 — sign-LSH blocking is built for that regime;
    * here it is exercised at the fixture's unfavorable threshold on
    * purpose so the recall number means something. The oracle mirrors
    * planes, signatures, and fold order, so results hash-match despite
    * the approximate candidate rule.
    */
  val embeddingLsh = Q(
    "q_dedup_embedding_lsh",
    (s, dir) => {
      val e = tbl(s, dir, "embeddings")
        // defined null semantic: excluded — BOTH columns. A null label
        // must not form its own LSH bucket: Spark's groupBy groups nulls
        // together while the oracle's equi-join drops them, so keeping
        // null-label rows silently diverges on null-injected corpora
        // (the null gate caught this in the cost-table candidate leg)
        .filter(col("embedding").isNotNull && col("label").isNotNull)
        .select(col("vec_id"), col("label"),
          expr("transform(embedding, x -> cast(x as double))").as("v"))
        .withColumn("nrm", expr("dot_product(v, v)"))
        // persisted: plane construction, the skew-guard's bucket-size pass,
        // and the signature expansion all read this frame
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val byId = e.filter(col("vec_id") < 64)
        .select(col("vec_id"), col("v")).collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
      // id-arithmetic plane pairing (table t, plane i = vec(8t+i) −
      // vec(8t+4+i)), exactly the oracle's rule — a missing/null seed
      // vector drops just its plane on BOTH sides; a table with no
      // planes drops entirely; no seeds at all degrades to no pairs
      def planes(t: Int) = (0 until 4).flatMap { i =>
        for (a <- byId.get(8L * t + i); b <- byId.get(8L * t + 4 + i))
          yield (i, a.zip(b).map { case (x, y) => x - y })
      }
      val tables = (0 until 8).filter(t => planes(t).nonEmpty)
      if (tables.isEmpty) {
        import org.apache.spark.sql.types._
        s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(Seq(StructField("ai", LongType),
            StructField("bi", LongType), StructField("cosine", DoubleType))))
      } else {
      def sigCol(t: Int) = planes(t).map { case (i, p) =>
        when(call_function("dot_product", col("v"), typedLit(p)) >= 0,
          lit(1L << i)).otherwise(lit(0L))
      }.reduce(_ + _)
      val sigs = e.select(col("vec_id"), col("label"), col("v"), col("nrm"),
        explode(array(tables.map(t =>
          struct(lit(t.toLong).as("t"), sigCol(t).as("sig"))): _*)).as("ts"))
        .select(col("vec_id"), col("label"), col("v"), col("nrm"),
          col("ts.t").as("t"), col("ts.sig").as("sig"))
      graft.ops.SkewGuard.saltOversized(
          sigs, Seq("t", "sig", "label"), "vec_id",
          metricName = "skew_guard_embedding_lsh")
        .groupBy("t", "sig", "label", "salt")
        .agg(sort_array(collect_list(
          struct(col("vec_id"), col("v"), col("nrm")))).as("members"))
        .filter(size(col("members")) > 1)
        .select(explode(expr(
          """filter(
               flatten(transform(members, (a, i) ->
                 transform(slice(members, i + 2, size(members)),
                           b -> struct(a.vec_id AS ai, b.vec_id AS bi,
                                       dot_product(a.v, b.v)
                                         / sqrt(a.nrm * b.nrm) AS cos)))),
               p -> p.cos >= 0.4)""")).as("p"))
        .select(col("p.ai").as("ai"), col("p.bi").as("bi"), col("p.cos").as("cos"))
        .distinct()
        .select(col("ai"), col("bi"), round(col("cos"), 6).as("cosine"))
        .orderBy("ai", "bi")
      }
    },
    Some("""WITH e AS (
              SELECT vec_id, label, embedding::DOUBLE[] AS v,
                     list_sum([x * x for x in embedding::DOUBLE[]]) AS nrm
              FROM embeddings
              WHERE embedding IS NOT NULL AND label IS NOT NULL),
            planes AS (
              SELECT a.vec_id // 8 AS t, a.vec_id % 8 AS i,
                     [a.v[k] - b.v[k]
                      FOR k IN generate_series(1, len(a.v))] AS pv
              FROM e a JOIN e b ON b.vec_id = a.vec_id + 4
              WHERE a.vec_id < 64 AND a.vec_id % 8 < 4),
            sigs AS (
              SELECT e.vec_id, e.label, p.t,
                     CAST(SUM(CASE WHEN list_sum([e.v[k] * p.pv[k]
                            FOR k IN generate_series(1, len(e.v))]) >= 0
                          THEN (2 ** p.i)::BIGINT ELSE 0 END) AS BIGINT) AS sig
              FROM e CROSS JOIN planes p
              GROUP BY e.vec_id, e.label, p.t),
            cands AS (
              SELECT DISTINCT x.vec_id AS ai, y.vec_id AS bi
              FROM sigs x JOIN sigs y
                ON x.t = y.t AND x.sig = y.sig AND x.label = y.label
               AND x.vec_id < y.vec_id)
            SELECT ai, bi,
                   ROUND(list_sum([a.v[k] * b.v[k]
                           FOR k IN generate_series(1, len(a.v))])
                         / sqrt(a.nrm * b.nrm), 6) AS cosine
            FROM cands JOIN e a ON a.vec_id = ai JOIN e b ON b.vec_id = bi
            WHERE list_sum([a.v[k] * b.v[k]
                    FOR k IN generate_series(1, len(a.v))])
                  / sqrt(a.nrm * b.nrm) >= 0.4
            ORDER BY ai, bi"""),
    bench = true)

  /** MinHash dedup through the materialized BUCKETED signature store
    * ([[graft.ops.SignatureStore.buildBanded]]): builds the banded store
    * bucketed by LSH bucket key, then runs the candidate join against it —
    * the store side needs no shuffle (bucketing satisfies the join's
    * distribution; asserted in SignatureStoreSpec). With the corpus joined
    * against its own store this finds exactly the MinHash-LSH pairs, so it
    * shares q_dedup_minhash's oracle — a cross-engine proof that the
    * store-layout path changes the plan, not the answer.
    */
  val storeBucketed = Q(
    "q_dedup_store_bucketed",
    (s, dir) => {
      val docs = tbl(s, dir, "documents")
      // table name unique per scale dir: concurrent Verify sweeps at
      // different SFs must not clobber each other's store builds
      val table = "graft_sig_store_" + dir.replaceAll("[^A-Za-z0-9]", "_")
      graft.ops.SignatureStore.buildBanded(docs, table, 8)
      graft.ops.SignatureStore
        .bucketedNearDups(s, table, docs)
        .select(col("ai"), col("bi"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("ai", "bi")
    },
    minhashLsh.oracle)

  /** MinHash dedup through the bucketed signature store AFTER A
    * TAKEDOWN (r11 verdict: a taken-down doc's signature kept pairing
    * it into near-dup candidates until a rebuild): every document with
    * `doc_id % 41 == 5` is forgotten via the store's ledger
    * ([[graft.ops.SignatureStore.takedownBanded]] — one staged write,
    * zero store files touched), and the candidate join then masks BOTH
    * pair sides, so the result hash-matches DuckDB recomputing the
    * full MinHash-LSH dedup over the COMPLEMENT corpus — banned ids in
    * no pair, and no surviving pair lost.
    */
  val storeAfterTakedown = Q(
    "q_dedup_after_takedown",
    (s, dir) => {
      val docs = tbl(s, dir, "documents")
      val table = "graft_sig_td_" + dir.replaceAll("[^A-Za-z0-9]", "_")
      graft.ops.SignatureStore.buildBanded(docs, table, 8)
      val banned = docs.filter(col("doc_id") % 41 === 5)
        .select(col("doc_id").cast("long")).collect()
        .map(_.getLong(0)).toSeq
      graft.ops.SignatureStore.takedownBanded(s, table, banned)
      graft.ops.SignatureStore
        .bucketedNearDups(s, table, docs)
        .select(col("ai"), col("bi"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("ai", "bi")
    },
    Some(minhashOracleOver(
      s"SELECT * FROM ($duckShingled) WHERE doc_id % 41 <> 5")))

  val all: Seq[Q] = Seq(exact, ngramJaccard, minhashLsh, simhash,
    simhash60, embeddingCosine, embeddingLsh, storeBucketed,
    storeAfterTakedown, decontaminate)
}
