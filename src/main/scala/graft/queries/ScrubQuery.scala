package graft.queries

import org.apache.spark.sql.functions._

import TextQueries.duckMd5num

/** Duplicate-span scrubbing over the documents table
  * ([[graft.ops.SpanScrub]]): every later occurrence of a 12-word tile is
  * DELETED and the document re-stitched from its surviving tiles — the
  * C4-style span-removal pass, distinct from `q_selfdedup_grams` (which
  * drops whole documents) and `q_chunk_dedup` (which reports chunk
  * duplication without reassembly). The oracle replays tiling (same
  * non-overlapping windows incl. the short tail tile), the md5num tile
  * identity, the global (doc_id, pos) first-occurrence rule, and the
  * ordered re-join, then compares the reassembled STRINGS — a hash match
  * proves byte-identical scrubbed documents cross-engine.
  */
object ScrubQuery {

  private val tileWords = 12

  val scrubSpans = Q(
    "q_scrub_spans",
    (s, dir) =>
      graft.ops.SpanScrub.scrub(
          tbl(s, dir, "documents").select("doc_id", "text"),
          "doc_id", "text", tileWords)
        .orderBy("doc_id"),
    Some(s"""WITH w AS (
              SELECT doc_id, string_split(text, ' ') AS ws FROM documents
              WHERE text IS NOT NULL),
            wi AS (
              SELECT doc_id, ws,
                     unnest(range(0, CAST(ceil(len(ws) / $tileWords.0)
                       AS BIGINT))) AS i
              FROM w),
            t AS (
              SELECT doc_id, CAST(i AS BIGINT) AS pos,
                     list_aggr(list_slice(ws, i * $tileWords + 1,
                       i * $tileWords + $tileWords), 'string_agg', ' ')
                       AS tile
              FROM wi),
            hh AS (SELECT doc_id, pos, tile, ${duckMd5num("tile")} AS h
                   FROM t),
            r AS (
              SELECT doc_id, pos, tile,
                     ROW_NUMBER() OVER (PARTITION BY h
                       ORDER BY doc_id, pos) AS rn
              FROM hh)
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tiles,
                   CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_removed,
                   COALESCE(string_agg(CASE WHEN rn = 1 THEN tile END, ' '
                     ORDER BY pos), '') AS scrubbed_text
            FROM r GROUP BY doc_id ORDER BY doc_id"""),
    bench = true)

  /** Incremental scrub through the REAL persistent tile ledger: the
    * corpus arrives as three id-ordered batches, each scrubbed against
    * all earlier batches' tiles ([[graft.ops.SpanScrub.scrubIncremental]])
    * and unioned. Because batch order matches the (doc_id, pos)
    * first-occurrence rule, the incremental result is provably the
    * one-shot answer — so this query shares `q_scrub_spans`' oracle
    * verbatim, and a hash-match proves the ledger machinery (persist,
    * novel-hash append, cross-batch delete) loses and invents nothing.
    * Same pattern as `q_cdc_merge` (incremental store vs declarative
    * one-shot lattice).
    */
  val scrubIncrementalQ = Q(
    "q_scrub_incremental",
    (s, dir) => {
      val docs = tbl(s, dir, "documents").select("doc_id", "text")
      // unique ledger PER INVOCATION: a shared sf-keyed path let two
      // overlapping runs at one scale factor (a restricted Verify re-run
      // during a sweep) delete/append each other's ledger mid-query
      val path = java.nio.file.Files
        .createTempDirectory("graft_scrub_ledger_").resolve("ledger")
        .toString
      // batches must be id-RANGES (not id % k interleaving): the keeper
      // rule is the global (doc_id, pos) first occurrence, and the ledger
      // gives unconditional priority to earlier batches — range batches
      // make those two orders agree, which is what equals one-shot.
      // Null-safe max: empty input (empty-input gate) → one empty batch.
      val n = Option(docs.agg(max("doc_id")).head().get(0))
        .map(_.asInstanceOf[Long]).getOrElse(0L)
      val ranges = Seq(
        docs.filter(col("doc_id") <= n / 3),
        docs.filter(col("doc_id") > n / 3 && col("doc_id") <= 2 * n / 3),
        docs.filter(col("doc_id") > 2 * n / 3))
      ranges.map(b => graft.ops.SpanScrub.scrubIncremental(
          b, "doc_id", "text", tileWords, path))
        .reduce(_.unionByName(_))
        .orderBy("doc_id")
    },
    scrubSpans.oracle)

  val all: Seq[Q] = Seq(scrubSpans, scrubIncrementalQ)
}
