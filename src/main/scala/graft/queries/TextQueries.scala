package graft.queries

import org.apache.spark.sql.functions._

/** Text-analysis operators over `documents` — the training-data-pipeline
  * surface (language ID, quality scoring, token counting, fingerprinting).
  *
  * All heavy lifting happens in codegen'd built-in/higher-order expressions
  * over a single scan: no UDFs, no shuffle except the final global sort for
  * the deterministic output contract. Corpus facts used: text is lowercase
  * `[a-z ]` with single spaces (verified against testdata).
  */
object TextQueries {

  /** Deterministic 60-bit hash from md5, identical in Spark and DuckDB:
    * first 15 hex chars of md5 parsed as a base-16 long. Backed by the
    * native codegen'd [[graft.functions.Md5Prefix60]] expression
    * (registered as `md5num` by `tbl`).
    */
  def md5numSql(inner: String): String = s"md5num($inner)"
  def duckMd5num(inner: String): String =
    s"('0x' || substr(md5($inner), 1, 15))::BIGINT"

  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "on")
  private[queries] val stopList = stopwords.map(w => s"'$w'").mkString(", ")

  /** Token counting: whitespace tokens + regex (BPE-ish pre-tokenizer)
    * counts, pushed down to a projection-only scan.
    */
  val tokenCount = Q(
    "q_token_count",
    (s, dir) => tbl(s, dir, "documents")
      .select(
        col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("ws_tokens"),
        regexp_count(col("text"), lit("[a-z]+|[0-9]+")).cast("long").as("re_tokens"),
        col("n_chars"))
      .orderBy("doc_id"),
    Some("""SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
                   CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS BIGINT) AS re_tokens,
                   n_chars
            FROM documents ORDER BY doc_id"""),
    bench = true)

  /** Quality scoring: length + stopword-density heuristic. The arithmetic
    * is written in the identical operation order on both engines so the
    * doubles match bit-for-bit.
    */
  val qualityScore = Q(
    "q_quality_score",
    (s, dir) => tbl(s, dir, "documents")
      .select(col("doc_id"), col("n_chars"),
        expr("size(split(text, ' '))").cast("long").as("n_tokens"),
        expr(s"size(filter(split(text, ' '), w -> w in ($stopList)))")
          .cast("long").as("stop_hits"))
      .withColumn("avg_word_len",
        round((col("n_chars") - (col("n_tokens") - lit(1))).cast("double")
          / col("n_tokens").cast("double"), 4))
      .withColumn("stop_ratio",
        round(col("stop_hits").cast("double") / col("n_tokens").cast("double"), 4))
      .withColumn("quality",
        round(
          least(lit(1.0), col("n_tokens").cast("double") / lit(100.0)) * lit(0.6)
            + (col("stop_hits").cast("double") / col("n_tokens").cast("double"))
            * lit(0.4), 4))
      .orderBy("doc_id"),
    Some(s"""SELECT doc_id, n_chars,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                   CAST(len(list_filter(string_split(text, ' '),
                     w -> w in ($stopList))) AS BIGINT) AS stop_hits,
                   ROUND(CAST(n_chars - (len(string_split(text, ' ')) - 1) AS DOUBLE)
                     / CAST(len(string_split(text, ' ')) AS DOUBLE), 4) AS avg_word_len,
                   ROUND(CAST(len(list_filter(string_split(text, ' '),
                       w -> w in ($stopList))) AS DOUBLE)
                     / CAST(len(string_split(text, ' ')) AS DOUBLE), 4) AS stop_ratio,
                   ROUND(LEAST(1.0, CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0) * 0.6
                     + (CAST(len(list_filter(string_split(text, ' '),
                         w -> w in ($stopList))) AS DOUBLE)
                        / CAST(len(string_split(text, ' ')) AS DOUBLE)) * 0.4, 4) AS quality
            FROM documents ORDER BY doc_id"""))

  /** Language ID via marker-word counts (n-gram-heuristic family): count
    * distinctive function words per language, argmax with a fixed
    * precedence chain. Deterministic CASE in both engines.
    */
  val langId = Q(
    "q_lang_id",
    (s, dir) => {
      def hits(words: Seq[String]) = {
        val list = words.map(w => s"'$w'").mkString(", ")
        expr(s"size(filter(split(text, ' '), w -> w in ($list)))").cast("long")
      }
      tbl(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          hits(Seq("the", "of", "and", "is")).as("en_hits"),
          hits(Seq("el", "la", "los", "es")).as("es_hits"),
          hits(Seq("der", "und", "das", "ist")).as("de_hits"),
          hits(Seq("le", "les", "des", "est")).as("fr_hits"))
        .withColumn("pred_lang",
          when(col("es_hits") > col("en_hits") &&
            col("es_hits") >= col("de_hits") &&
            col("es_hits") >= col("fr_hits"), "es")
            .when(col("de_hits") > col("en_hits") &&
              col("de_hits") >= col("fr_hits"), "de")
            .when(col("fr_hits") > col("en_hits"), "fr")
            .otherwise("en"))
        .withColumn("is_match", (col("pred_lang") === col("lang")).cast("boolean"))
        .orderBy("doc_id")
    },
    Some("""WITH h AS (
             SELECT doc_id, lang,
               CAST(len(list_filter(string_split(text,' '), w -> w in ('the','of','and','is'))) AS BIGINT) AS en_hits,
               CAST(len(list_filter(string_split(text,' '), w -> w in ('el','la','los','es'))) AS BIGINT) AS es_hits,
               CAST(len(list_filter(string_split(text,' '), w -> w in ('der','und','das','ist'))) AS BIGINT) AS de_hits,
               CAST(len(list_filter(string_split(text,' '), w -> w in ('le','les','des','est'))) AS BIGINT) AS fr_hits
             FROM documents)
            SELECT doc_id, lang, en_hits, es_hits, de_hits, fr_hits,
                   CASE WHEN es_hits > en_hits AND es_hits >= de_hits AND es_hits >= fr_hits THEN 'es'
                        WHEN de_hits > en_hits AND de_hits >= fr_hits THEN 'de'
                        WHEN fr_hits > en_hits THEN 'fr'
                        ELSE 'en' END AS pred_lang,
                   (CASE WHEN es_hits > en_hits AND es_hits >= de_hits AND es_hits >= fr_hits THEN 'es'
                         WHEN de_hits > en_hits AND de_hits >= fr_hits THEN 'de'
                         WHEN fr_hits > en_hits THEN 'fr'
                         ELSE 'en' END = lang) AS is_match
            FROM h ORDER BY doc_id"""))

  /** Document fingerprinting: whole-document content hash plus a rolling
    * min-hash over 5-gram word shingles (winnowing-style minimum). The
    * shingle minimum is the native [[graft.functions.MinShingleHash]]
    * kernel — one buffered pass, no per-shingle array/string
    * materialization; `coalesce` covers the <5-word fallback (the
    * expression returns null there), mirroring the oracle's CASE.
    */
  val fingerprint = Q(
    "q_fingerprint",
    (s, dir) => tbl(s, dir, "documents")
      .select(col("doc_id"), col("text"), md5(col("text")).as("fp_md5"),
        split(col("text"), " ").as("w"))
      .select(col("doc_id"), col("fp_md5"),
        expr(s"coalesce(min_shingle_hash(w, 5), ${md5numSql("text")})")
          .as("min_shingle_hash"))
      .orderBy("doc_id"),
    Some(s"""SELECT doc_id, md5(text) AS fp_md5,
                   CASE WHEN len(string_split(text, ' ')) < 5
                     THEN ${duckMd5num("text")}
                     ELSE list_min([${duckMd5num(
      "list_aggr(list_slice(string_split(text, ' '), i, i + 4), 'string_agg', ' ')")}
                       for i in generate_series(1, len(string_split(text, ' ')) - 4)])
                   END AS min_shingle_hash
            FROM documents ORDER BY doc_id"""),
    bench = true)

  /** Multimodal plumbing: treat content as an opaque binary column with
    * typed metadata and extract deterministic "features" (the real
    * decode/resize path is stubbed in graft.ops.Multimodal — image/audio
    * libs are out of scope — but the schema/partitioning/batch shape is
    * exercised here end-to-end on binary data).
    */
  val multimodalFeatures = Q(
    "q_multimodal_features",
    (s, dir) => tbl(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
      .select(
        col("doc_id"),
        length(col("blob")).cast("long").as("n_bytes"),
        md5(col("blob")).as("content_hash"),
        (length(col("blob")) % 640).cast("long").as("fake_width"),
        (length(col("blob")) % 480).cast("long").as("fake_height"))
      .orderBy("doc_id"),
    Some("""SELECT doc_id,
                   CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                   md5(text) AS content_hash,
                   CAST(octet_length(encode(text)) % 640 AS BIGINT) AS fake_width,
                   CAST(octet_length(encode(text)) % 480 AS BIGINT) AS fake_height
            FROM documents ORDER BY doc_id"""))

  /** PII scrubbing ([[graft.ops.Redaction]]), oracle-checked END TO END:
    * deterministic PII (emails, URLs, IPv4s, phone numbers derived from
    * doc_id) is woven into real corpus text, scrubbed by the sequential
    * codegen'd `regexp_replace` rules, and DuckDB must reproduce the
    * redacted strings byte-for-byte with the same patterns under RE2 —
    * proving the rule set stays inside the Java∩RE2 regex subset and the
    * ordering contract (emails before URLs before IPs before phones)
    * behaves identically. Per-rule hit counters are staged (each counts
    * the text as that rule saw it).
    */
  val redactPii = Q(
    "q_redact_pii",
    (s, dir) => {
      import graft.ops.Redaction
      val synth = tbl(s, dir, "documents").select(
        col("doc_id"),
        concat(
          lit("contact "), col("lang"), lit("_"),
          col("doc_id").cast("string"),
          lit("@mail"), pmod(col("doc_id"), lit(7)).cast("string"),
          lit(".example.org see http://site"),
          pmod(col("doc_id"), lit(13)).cast("string"),
          lit(".example.net/p/"), col("doc_id").cast("string"),
          lit(" from 10."), pmod(col("doc_id"), lit(256)).cast("string"),
          lit(".0."), pmod(col("doc_id") * 7, lit(256)).cast("string"),
          lit(" tel 415-555-"),
          lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
          lit(" :: "), substring(col("text"), 1, 60)).as("raw"))
      val (clean, counts) = Redaction.scrubWithCounts(col("raw"))
      synth.select(col("doc_id") +: clean.as("redacted") +: counts: _*)
        .orderBy("doc_id")
    },
    Some(s"""WITH synth AS (
              SELECT doc_id,
                'contact ' || lang || '_' || CAST(doc_id AS VARCHAR) ||
                '@mail' || CAST(doc_id % 7 AS VARCHAR) ||
                '.example.org see http://site' ||
                CAST(doc_id % 13 AS VARCHAR) || '.example.net/p/' ||
                CAST(doc_id AS VARCHAR) ||
                ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.' ||
                CAST((doc_id * 7) % 256 AS VARCHAR) ||
                ' tel 415-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
                ' :: ' || substr(text, 1, 60) AS t0
              FROM documents),
            s1 AS (SELECT doc_id, t0,
              regexp_replace(t0, '${graft.ops.Redaction.EmailPattern}', '<EMAIL>', 'g') AS t1 FROM synth),
            s2 AS (SELECT doc_id, t0, t1,
              regexp_replace(t1, '${graft.ops.Redaction.UrlPattern}', '<URL>', 'g') AS t2 FROM s1),
            s3 AS (SELECT doc_id, t0, t1, t2,
              regexp_replace(t2, '${graft.ops.Redaction.Ipv4Pattern}', '<IP>', 'g') AS t3 FROM s2)
            SELECT doc_id,
              regexp_replace(t3, '${graft.ops.Redaction.PhonePattern}', '<PHONE>', 'g') AS redacted,
              CAST(len(regexp_extract_all(t0, '${graft.ops.Redaction.EmailPattern}')) AS BIGINT) AS n_email,
              CAST(len(regexp_extract_all(t1, '${graft.ops.Redaction.UrlPattern}')) AS BIGINT) AS n_url,
              CAST(len(regexp_extract_all(t2, '${graft.ops.Redaction.Ipv4Pattern}')) AS BIGINT) AS n_ip,
              CAST(len(regexp_extract_all(t3, '${graft.ops.Redaction.PhonePattern}')) AS BIGINT) AS n_phone
            FROM s3 ORDER BY doc_id"""))

  /** Document chunking ([[graft.ops.Chunker]]) — 20-word windows, stride
    * 15 (5-word overlap), provenance-carrying. The oracle recomputes
    * every window with DuckDB list slicing, so the boundary semantics
    * (ceil(n/stride) chunks, clamped final window, 1-based slice math)
    * are pinned cross-engine, not just asserted.
    */
  val chunkDocs = Q(
    "q_chunk_docs",
    (s, dir) => graft.ops.Chunker.chunk(
        tbl(s, dir, "documents").select("doc_id", "lang", "text"), "text")
      .select(col("doc_id"), col("lang"), col("chunk_idx"), col("chunk"),
        col("n_words"))
      .orderBy("doc_id", "chunk_idx"),
    Some("""WITH w AS (
              SELECT doc_id, lang, string_split(text, ' ') AS w
              FROM documents
              WHERE len(string_split(text, ' ')) > 0),
            wi AS (
              -- chunk indices driven by EACH document's own length
              -- (ceil(n/stride) = exact chunk count), so no fixed cap can
              -- silently truncate a long document's tail chunks
              SELECT doc_id, lang, w,
                     unnest(range(0, CAST(ceil(len(w) / 15.0) AS BIGINT))) AS i
              FROM w)
            SELECT doc_id, lang, CAST(i AS BIGINT) AS chunk_idx,
                   list_aggr(list_slice(w, i * 15 + 1, i * 15 + 20),
                             'string_agg', ' ') AS chunk,
                   CAST(len(list_slice(w, i * 15 + 1, i * 15 + 20)) AS BIGINT)
                     AS n_words
            FROM wi
            ORDER BY doc_id, chunk_idx"""))

  /** Corpus n-gram diversity per language — the mode-collapse detector
    * for synthetic/generated data: distinct 3-grams across the corpus ÷
    * total per-document distinct 3-grams. 1.0 = no gram shared between
    * any two documents; a collapsing generator (many documents reusing
    * the same phrasing) drags it toward 0 long before exact or near-dup
    * rules fire. Complements `q_repetition` (which scores repetition
    * WITHIN a document). Grams travel as the 60-bit `shingle_hashes`
    * digests — 8-byte longs through the (lang, gram) distinct, never
    * strings; the oracle replays the digest identity.
    */
  val ngramDiversity = Q(
    "q_ngram_diversity",
    (s, dir) => {
      val docs = tbl(s, dir, "documents")
        .filter(col("text").isNotNull && col("lang").isNotNull)
        .select(col("lang"),
          expr("shingle_hashes(split(text, ' '), 3)").as("gs"))
        .filter(size(col("gs")) > 0) // docs shorter than n: no grams
      docs.select(col("lang"), explode(col("gs")).as("g"))
        .groupBy("lang")
        .agg(countDistinct(col("g")).as("n_distinct"),
          count(lit(1)).as("n_total"))
        .withColumn("diversity",
          round(col("n_distinct").cast("double") /
            col("n_total").cast("double"), 6))
        .orderBy("lang")
    },
    Some(s"""WITH g AS (
              SELECT lang,
                     list_distinct([${duckMd5num(
      "list_aggr(list_slice(w, i, i + 2), 'string_agg', ' ')")}
                       for i in generate_series(1, len(w) - 2)]) AS gs
              FROM (SELECT lang, string_split(text, ' ') AS w
                    FROM documents
                    WHERE text IS NOT NULL AND lang IS NOT NULL)
              WHERE len(w) >= 3),
            ex AS (SELECT lang, unnest(gs) AS g FROM g)
            SELECT lang, CAST(COUNT(DISTINCT g) AS BIGINT) AS n_distinct,
                   CAST(COUNT(*) AS BIGINT) AS n_total,
                   ROUND(COUNT(DISTINCT g)::DOUBLE / COUNT(*), 6)
                     AS diversity
            FROM ex GROUP BY lang
            ORDER BY lang"""))

  /** k-anonymity report over the events stream (k = 5): group sizes on
    * the quasi-identifier pair (user-id bucket, event type), then a
    * per-type enforcement summary — rows whose QI group has fewer than k
    * members would be SUPPRESSED before release (the
    * generalize-or-suppress rule; the companion to `q_redact_pii`, which
    * scrubs content while this bounds linkability). Two aggregates, both
    * map-side combining; group-size state is bounded by the QI domain,
    * never row count.
    */
  val kAnonymity = Q(
    "q_kanonymity",
    (s, dir) => {
      val qi = tbl(s, dir, "events")
        .filter(col("user_id").isNotNull && col("event_type").isNotNull)
        .select((col("user_id") % 100).as("ub"), col("event_type"))
      qi.groupBy("ub", "event_type").agg(cnt("gn"))
        .groupBy("event_type")
        .agg(sum("gn").as("n_rows"), cnt("n_groups"),
          sum(when(col("gn") < 5, col("gn")).otherwise(0L))
            .as("n_suppressed"),
          min("gn").as("min_group"))
        .orderBy("event_type")
    },
    Some("""WITH qi AS (
              SELECT user_id % 100 AS ub, event_type FROM events
              WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
            g AS (
              SELECT ub, event_type, COUNT(*) AS gn
              FROM qi GROUP BY ub, event_type)
            SELECT event_type, CAST(SUM(gn) AS BIGINT) AS n_rows,
                   CAST(COUNT(*) AS BIGINT) AS n_groups,
                   CAST(SUM(CASE WHEN gn < 5 THEN gn ELSE 0 END) AS BIGINT)
                     AS n_suppressed,
                   CAST(MIN(gn) AS BIGINT) AS min_group
            FROM g GROUP BY event_type
            ORDER BY event_type"""))

  val all: Seq[Q] = Seq(tokenCount, qualityScore, langId, fingerprint,
    multimodalFeatures, redactPii, chunkDocs, ngramDiversity, kAnonymity)
}
