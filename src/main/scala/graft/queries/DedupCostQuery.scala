package graft.queries

import org.apache.spark.sql.functions._

import TextQueries.duckMd5num

/** The near-dup method DECISION TABLE over the documents table — the
  * dedup counterpart of `q_ann_cost`: per method, how many candidate
  * pairs the blocking scheme asks us to verify (the pair-verification
  * cost that dominates dedup at 100 TB), how many survive verification,
  * and how much of the exact ground truth the method recovers.
  *
  * Methods and their replayed CANDIDATE stages (same band/bucket rules
  * as the production queries, pre-verification):
  *   - `exact`: md5(text) hash groups — candidates = Σ C(n,2) per
  *     group, verification is the hash equality itself;
  *   - `minhash`: 4×4-banded MinHash signatures, candidates = distinct
  *     band-collision pairs (`q_dedup_minhash`'s bucket expansion),
  *     verified by exact Jaccard ≥ 0.5;
  *   - `simhash60`: 6×10-bit bands over 60-bit SimHash, candidates =
  *     distinct same-(band, lang) pairs, verified by Hamming ≤ 5.
  *
  * Ground truth = `q_dedup_ngram_jaccard` (blocked exact Jaccard ≥ 0.5
  * pairs). `recall` = truth pairs the method's VERIFIED output contains;
  * `verify_rate` = verified / candidates — the yield per verification
  * dollar (a low rate means the blocking scheme drags false candidates
  * to the expensive exact check). A method can also find verified pairs
  * OUTSIDE the truth's (lang, length-window) blocking — those are real
  * near-dups the blocked truth definition cannot see, which is why
  * `hit_pairs` is reported rather than a misleading "precision".
  *
  * Scale shape: every candidate stage is the production one — banded
  * groupBy shuffles with [[graft.ops.SkewGuard]] salting, never
  * all-pairs; the truth leg keeps `q_dedup_ngram_jaccard`'s
  * (lang, length-bucket) equi-blocking. Counts are map-side-combining
  * aggregates; the only joins are over verified-pair frames (tiny).
  */
object DedupCostQuery {

  private val P = graft.functions.MinHashSig.P
  private val A = graft.functions.MinHashSig.A.toSeq
  private val B = graft.functions.MinHashSig.B.toSeq

  val dedupCost = Q(
    "q_dedup_cost",
    (s, dir) => {
      graft.functions.GraftFunctions.ensureRegistered(s)
      val docs = tbl(s, dir, "documents")

      // ---- exact: hash groups, candidates = found = Σ C(n,2)
      val exactPairs = docs.groupBy(md5(col("text")).as("h"))
        .agg(count(lit(1)).as("n"))
        .agg(coalesce(sum(expr("n * (n - 1) div 2")), lit(0L))
          .cast("long").as("c"))

      // ---- minhash: candidate stage of q_dedup_minhash (bands → salted
      // buckets → distinct pairs), WITHOUT the Jaccard verify
      val sh = docs
        .select(col("doc_id"), col("lang"), col("n_chars"),
          split(col("text"), " ").as("w"))
        .filter(expr("size(w) >= 3"))
        .select(col("doc_id"),
          expr("""array_distinct(transform(
                    sequence(1, size(w) - 2),
                    i -> concat_ws(' ', slice(w, i, 3))))""").as("s"))
        .select(col("doc_id"), expr("minhash_sig(s)").as("sig"))
      val mhBands = sh.select(col("doc_id"),
        posexplode(expr(
          "transform(sequence(0, 3), b -> slice(sig, b * 4 + 1, 4))")))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bvals")
      val mhCand = graft.ops.SkewGuard.saltOversized(
          mhBands, Seq("band", "bvals"), "doc_id",
          metricName = "skew_guard_dedup_cost_mh")
        .groupBy("band", "bvals", "salt")
        .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
        .filter(size(col("ids")) > 1)
        .select(explode(expr(
          """flatten(transform(ids, (a, i) ->
               transform(slice(ids, i + 2, size(ids)),
                         b -> struct(a AS ai, b AS bi))))""")).as("p"))
        .select(col("p.ai").as("ai"), col("p.bi").as("bi"))
        .distinct()

      // ---- simhash60: candidate stage of q_dedup_simhash60 (6×10-bit
      // bands, same-lang), WITHOUT the Hamming verify
      val shDocs = docs
        .filter(col("text").isNotNull && col("lang").isNotNull)
        .select(col("doc_id"), col("lang"),
          expr("simhash60(split(text, ' '))").as("sh"))
      val shBands = shDocs.select(col("doc_id"), col("lang"),
        posexplode(expr(
          "transform(sequence(0, 5), b -> (sh div cast(pow(2, b * 10) as bigint)) % 1024)")))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bbits")
      val shCand = graft.ops.SkewGuard.saltOversized(
          shBands, Seq("band", "bbits", "lang"), "doc_id",
          metricName = "skew_guard_dedup_cost_sh")
        .groupBy("band", "bbits", "lang", "salt")
        .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
        .filter(size(col("ids")) > 1)
        .select(explode(expr(
          """flatten(transform(ids, (a, i) ->
               transform(slice(ids, i + 2, size(ids)),
                         b -> struct(a AS ai, b AS bi))))""")).as("p"))
        .select(col("p.ai").as("ai"), col("p.bi").as("bi"))
        .distinct()

      // ---- verified outputs: the production queries, reused verbatim
      val truth = DedupQueries.ngramJaccard.spark(s, dir)
        .select(col("ai"), col("bi"))
      val mh = DedupQueries.minhashLsh.spark(s, dir)
        .select(col("ai"), col("bi"))
      val s60 = DedupQueries.simhash60.spark(s, dir)
        .select(col("ai"), col("bi"))

      def one(df: org.apache.spark.sql.DataFrame, as: String) =
        df.agg(count(lit(1)).cast("long").as(as))
      val tc = one(truth, "t")
      // exact hits: a truth pair is exact iff the two texts hash equal —
      // joined on the bounded verified-truth frame, never pair-exploded
      val da = docs.select(col("doc_id").as("ai"), md5(col("text")).as("ha"))
      val db = docs.select(col("doc_id").as("bi"), md5(col("text")).as("hb"))
      val eHits = one(truth.join(da, "ai").join(db, "bi")
        .filter(col("ha") === col("hb")), "h")
      val mhHits = one(mh.join(truth, Seq("ai", "bi")), "h")
      val shHits = one(s60.join(truth, Seq("ai", "bi")), "h")

      def row(method: String, cand: org.apache.spark.sql.DataFrame,
          found: org.apache.spark.sql.DataFrame,
          hits: org.apache.spark.sql.DataFrame) =
        cand.toDF("c").crossJoin(found.toDF("f")).crossJoin(hits)
          .crossJoin(tc)
          .select(lit(method).as("method"), col("c").as("cand_pairs"),
            col("f").as("found_pairs"), col("t").as("truth_pairs"),
            col("h").as("hit_pairs"),
            when(col("t") === 0, lit(null).cast("double"))
              .otherwise(round(col("h").cast("double")
                / col("t").cast("double"), 6)).as("recall"),
            when(col("c") === 0, lit(null).cast("double"))
              .otherwise(round(col("f").cast("double")
                / col("c").cast("double"), 6)).as("verify_rate"))

      row("exact", exactPairs, exactPairs, eHits)
        .unionByName(row("minhash", one(mhCand, "c"), one(mh, "f"), mhHits))
        .unionByName(row("simhash60", one(shCand, "c"), one(s60, "f"),
          shHits))
        .orderBy("method")
    },
    Some(s"""WITH truth0 AS (${DedupQueries.ngramJaccard.oracle.get}),
            truth AS (SELECT ai, bi FROM truth0),
            mh0 AS (${DedupQueries.minhashLsh.oracle.get}),
            mh AS (SELECT ai, bi FROM mh0),
            s600 AS (${DedupQueries.simhash60.oracle.get}),
            s60 AS (SELECT ai, bi FROM s600),
            ec AS (SELECT CAST(COALESCE(SUM(n * (n - 1) // 2), 0) AS BIGINT)
                     AS c
                   FROM (SELECT COUNT(*) AS n FROM documents
                         GROUP BY md5(text))),
            msh AS (
              SELECT doc_id,
                     list_distinct([list_aggr(
                       list_slice(string_split(text, ' '), i, i + 2),
                       'string_agg', ' ')
                       for i in generate_series(1,
                         len(string_split(text, ' ')) - 2)]) AS s
              FROM documents
              WHERE len(string_split(text, ' ')) >= 3),
            mbased AS (
              SELECT doc_id, [${duckMd5num("x")} % $P for x in s] AS bases
              FROM msh),
            msig AS (
              SELECT doc_id,
                     [list_min([(([${A.mkString(", ")}])[j + 1] * h
                                 + ([${B.mkString(", ")}])[j + 1]) % $P
                                for h in bases])
                      for j in generate_series(0, 15)] AS sig
              FROM mbased),
            mbands AS (
              SELECT doc_id, b AS band,
                     list_slice(sig, b * 4 + 1, b * 4 + 4) AS bvals
              FROM msig CROSS JOIN generate_series(0, 3) AS t(b)),
            mcand AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS c FROM (
                SELECT DISTINCT x.doc_id, y.doc_id
                FROM mbands x JOIN mbands y
                  ON x.band = y.band AND x.bvals = y.bvals
                 AND x.doc_id < y.doc_id)),
            stoks AS (
              SELECT doc_id, lang,
                     [${duckMd5num("t")} for t in string_split(text, ' ')]
                       AS th
              FROM documents
              WHERE text IS NOT NULL AND lang IS NOT NULL),
            sdocs AS (
              SELECT doc_id, lang,
                     CAST(list_sum([CASE WHEN 2 * len(list_filter(th,
                         h -> (h // (2 ** i)::BIGINT) % 2 = 1))
                       > len(th)
                       THEN (2 ** i)::BIGINT ELSE 0 END
                       for i in generate_series(0, 59)]) AS BIGINT) AS sh
              FROM stoks),
            sbands AS (
              SELECT doc_id, lang, b,
                     (sh // ((2 ** (b * 10))::BIGINT)) % 1024 AS bbits
              FROM sdocs CROSS JOIN generate_series(0, 5) AS t(b)),
            scand AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS c FROM (
                SELECT DISTINCT a.doc_id, b.doc_id
                FROM sbands a JOIN sbands b
                  ON a.b = b.b AND a.bbits = b.bbits AND a.lang = b.lang
                 AND a.doc_id < b.doc_id)),
            tc AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM truth),
            eh AS (SELECT CAST(COUNT(*) AS BIGINT) AS h
                   FROM truth t
                   JOIN documents da ON da.doc_id = t.ai
                   JOIN documents db ON db.doc_id = t.bi
                   WHERE md5(da.text) = md5(db.text)),
            mhh AS (SELECT CAST(COUNT(*) AS BIGINT) AS h
                    FROM mh JOIN truth USING (ai, bi)),
            shh AS (SELECT CAST(COUNT(*) AS BIGINT) AS h
                    FROM s60 JOIN truth USING (ai, bi)),
            mf AS (SELECT CAST(COUNT(*) AS BIGINT) AS f FROM mh),
            sf AS (SELECT CAST(COUNT(*) AS BIGINT) AS f FROM s60),
            legs AS (
              SELECT 'exact' AS method, (SELECT c FROM ec) AS cand_pairs,
                     (SELECT c FROM ec) AS found_pairs,
                     (SELECT h FROM eh) AS hit_pairs
              UNION ALL SELECT 'minhash', (SELECT c FROM mcand),
                     (SELECT f FROM mf), (SELECT h FROM mhh)
              UNION ALL SELECT 'simhash60', (SELECT c FROM scand),
                     (SELECT f FROM sf), (SELECT h FROM shh))
            SELECT method, cand_pairs, found_pairs,
                   (SELECT t FROM tc) AS truth_pairs, hit_pairs,
                   CASE WHEN (SELECT t FROM tc) = 0 THEN NULL
                        ELSE ROUND(CAST(hit_pairs AS DOUBLE)
                          / CAST((SELECT t FROM tc) AS DOUBLE), 6) END
                     AS recall,
                   CASE WHEN cand_pairs = 0 THEN NULL
                        ELSE ROUND(CAST(found_pairs AS DOUBLE)
                          / CAST(cand_pairs AS DOUBLE), 6) END
                     AS verify_rate
            FROM legs ORDER BY method"""))

  val all: Seq[Q] = Seq(dedupCost)
}
