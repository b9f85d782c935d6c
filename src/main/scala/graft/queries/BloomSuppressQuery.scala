package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.BloomSuppress

/** Oracle checks for [[graft.ops.BloomSuppress]] — sketch-pruned
  * suppression anti-joins whose ANSWERS are exact (the Bloom filter only
  * prunes; hits are re-verified), so the DuckDB oracle is the plain
  * anti-join with no sketch anywhere in it. Cross-engine equality is the
  * proof that the pruning is answer-preserving.
  *
  * Fixture: the suppression list is the fingerprint set of the
  * "already-trained" third of the corpus (`doc_id % 3 = 0`); the corpus
  * is every document keyed by its content fingerprint. A document
  * survives iff its TEXT does not appear in the trained shard — note
  * content identity, not id identity: an unseen id carrying seen text is
  * suppressed, exactly the dedup-against-prior-runs contract.
  */
object BloomSuppressQuery {

  import TextQueries.duckMd5num

  // `text IS NOT NULL` in the subquery: a NULL in a NOT IN list turns
  // the whole predicate UNKNOWN in SQL (zero rows), while the Spark side
  // simply never folds nulls into the sketch — align on "null
  // fingerprints suppress nothing". Null-text CORPUS rows drop on both
  // sides (UNKNOWN in SQL; null probe key in Spark).
  private val surviveSql =
    s"""SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(doc_id) AS BIGINT) AS id_sum,
               CAST(SUM(n_chars) AS BIGINT) AS chars_sum
        FROM documents
        WHERE ${duckMd5num("text")} NOT IN
              (SELECT ${duckMd5num("text")} FROM documents
               WHERE doc_id % 3 = 0 AND text IS NOT NULL)
        GROUP BY lang ORDER BY lang NULLS FIRST"""

  private def survivorStats(
      df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df.groupBy(col("lang"))
      .agg(cnt("n_docs"), sum(col("doc_id")).as("id_sum"),
        sum(col("n_chars")).as("chars_sum"))
      .orderBy("lang")

  /** One-shot form: sketch built in-query from the suppression side. */
  val suppress = Q(
    "q_bloom_suppress",
    (s, dir) => {
      val docs = tbl(s, dir, "documents")
        .withColumn("fp", expr("md5num(text)"))
      val trained = docs.filter(col("doc_id") % 3 === 0).select(col("fp"))
      survivorStats(BloomSuppress.antiJoin(docs, trained, "fp"))
    },
    Some(surviveSql),
    bench = true)

  /** Ledger form: the suppression list accrues as TWO shard sketches in
    * an on-disk ledger (staged concurrent-safe appends), is read back and
    * union-merged with `bloom_merge_agg`, and only then probes the
    * corpus. Answers must equal the one-shot form's — same oracle SQL —
    * which pins the whole persistence path (append → read → merge →
    * probe → verify) to exact anti-join semantics.
    */
  val ledger = Q(
    "q_bloom_ledger",
    (s, dir) => {
      val docs = tbl(s, dir, "documents")
        .withColumn("fp", expr("md5num(text)"))
      val trained = docs.filter(col("doc_id") % 3 === 0)
      val ledgerDir = java.nio.file.Files
        .createTempDirectory("graft_bloom_ledger").toString + "/sketches"
      // Capacity pinned for the ledger's lifetime volume, not per shard.
      val cap = math.max(64L, trained.count())
      Seq(0, 1).foreach { half =>
        BloomSuppress.appendShard(
          trained.filter(col("doc_id") % 2 === half).select(col("fp")),
          "fp", ledgerDir, s"shard_$half", cap)
      }
      val bf = BloomSuppress.ledgerSketch(s, ledgerDir)
      survivorStats(BloomSuppress.antiJoinSketch(
        docs, trained.select(col("fp")), "fp", bf))
    },
    Some(surviveSql))

  val all: Seq[Q] = Seq(suppress, ledger)
}
