package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BM25 full-text retrieval — the lexical-search leg of the engine,
  * beside the ANN family (`VectorIndex`/`ProductQuantizer`): score
  * documents against a bag-of-terms query with the standard
  * Okapi/Lucene BM25 ranking function and return the top-k.
  *
  * Determinism contract (the same discipline as [[NgramLm]]): each
  * (doc, term) contribution is ONE double expression evaluated in a fixed
  * parse shape — idf = ln(1 + (N − df + 0.5)/(df + 0.5)) (the Lucene
  * variant, always positive) times the tf/length normalization — then
  * quantized to a long on the 2^30 grid. Per-document scores are sums of
  * LONGS, so they are order-free (a float sum over shuffled rows would be
  * partitioning-dependent), and the ranking compares exact integers —
  * two engines that agree on the contribution doubles agree on the whole
  * ranking, which is what lets DuckDB replay the query hash-exactly.
  *
  * Scale shape: per-document term frequencies come from the one-pass
  * native `term_counts` kernel in the projection (no token-level
  * shuffle); the query-term filter runs map-side BEFORE any exchange, so
  * the only rows that move are the postings of the query's own terms;
  * document frequencies (≤ |query| rows) and the corpus stats row are
  * broadcast; the final top-k is a TakeOrdered, not a global sort. The
  * materialized twin ([[buildIndex]]/[[probeIndex]]) moves the postings
  * build offline into a term-bucket-partitioned store so a query reads
  * only its own terms' partitions (dynamic pruning by literal bucket
  * ids), which is the inverted-index serving shape at 100 TB.
  */
object Bm25 {

  /** 2^30 — the contribution quantization grid. */
  val Scale: Double = 1073741824.0

  /** (id, term, tf, dl): one row per DISTINCT document×term, with the
    * document length carried alongside — the posting-list relation. The
    * per-document counting happens in the projection via the native
    * `term_counts` kernel, so nothing token-level ever shuffles.
    */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(docs.sparkSession)
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol), split(col(textCol), " ").as("w"))
      .select(col(idCol), expr("term_counts(w)").as("tcs"),
        size(col("w")).cast("long").as("dl"))
      .select(col(idCol), explode(col("tcs")).as("tc"), col("dl"))
      .select(col(idCol), col("tc.term").as("term"),
        col("tc.tf").as("tf"), col("dl"))
  }

  /** One row (n, sdl, avgdl): corpus document count, total length, mean
    * length (exact-integer operands, one IEEE division).
    */
  def corpusStats(docs: DataFrame, textCol: String): DataFrame =
    docs.filter(col(textCol).isNotNull)
      .select(size(split(col(textCol), " ")).cast("long").as("dl"))
      .agg(count(lit(1)).cast("long").as("n"), sum("dl").as("sdl"))
      .withColumn("avgdl",
        col("sdl").cast("double") / col("n").cast("double"))

  /** The quantized per-(doc,term) BM25 contribution, as a SQL fragment
    * shared in shape with the DuckDB oracle: operand columns must be the
    * doubles nd (corpus n), dfd (term df), tfd, dld and avgdl.
    */
  def contribSql(k1: String, b: String): String =
    s"""cast(floor(
          ln(1.0 + (nd - dfd + 0.5) / (dfd + 0.5))
            * (tfd * (1.0 + $k1))
            / (tfd + $k1 * (1.0 - $b + ($b * dld) / avgdl))
            * 1073741824.0) as bigint)"""

  /** Score a posting frame against `terms` and return the top-k:
    * (id, n_terms, score_fp, score). `k1`/`b` ride as literal strings so
    * the Spark expression and the oracle SQL are the same text.
    */
  def scorePostings(
      p: DataFrame,
      stats: DataFrame,
      idCol: String,
      terms: Seq[String],
      k1: String = "1.2",
      b: String = "0.75",
      topK: Int = 20): DataFrame = {
    val filtered = p.filter(col("term").isin(terms: _*))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dfF = filtered.groupBy("term")
      .agg(count(lit(1)).cast("long").as("df"))
    filtered
      .join(broadcast(dfF), "term")
      .crossJoin(broadcast(stats))
      .withColumn("nd", col("n").cast("double"))
      .withColumn("dfd", col("df").cast("double"))
      .withColumn("tfd", col("tf").cast("double"))
      .withColumn("dld", col("dl").cast("double"))
      .withColumn("c", expr(contribSql(k1, b)))
      .groupBy(idCol)
      .agg(count(lit(1)).cast("long").as("n_terms"),
        sum("c").as("score_fp"))
      .orderBy(col("score_fp").desc, col(idCol))
      .limit(topK)
      .select(col(idCol), col("n_terms"), col("score_fp"),
        round(col("score_fp").cast("double") / lit(Scale), 6).as("score"))
  }

  /** End-to-end in-query search over a corpus. */
  def search(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      k1: String = "1.2",
      b: String = "0.75",
      topK: Int = 20): DataFrame =
    scorePostings(postings(docs, idCol, textCol),
      corpusStats(docs, textCol), idCol, terms, k1, b, topK)

  /** Materialize the inverted index: postings partitioned by the term's
    * hash bucket (`tb=` hive dirs, so a probe prunes to its own terms'
    * partitions) plus the one-row stats table. `nBuckets` is recorded in
    * the stats row, so probes never need to be told the layout.
    */
  def buildIndex(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      path: String,
      nBuckets: Int = 16): Unit = {
    postings(docs, idCol, textCol)
      .withColumn("tb", pmod(xxhash64(col("term")), lit(nBuckets.toLong)))
      .write.mode("overwrite").partitionBy("tb")
      .parquet(s"$path/postings")
    corpusStats(docs, textCol).drop("avgdl")
      .withColumn("n_buckets", lit(nBuckets.toLong))
      .write.mode("overwrite").parquet(s"$path/stats")
  }

  /** Aggregate the stats DELTA LEDGER to the one-row (n, sdl, avgdl,
    * n_buckets) frame the scorer consumes. The store keeps one delta row
    * per ingested batch instead of one mutable total: summing commutes,
    * so concurrent appends cannot lose each other's contribution (the
    * old read-modify-overwrite row lost a delta whenever two appends
    * interleaved — last writer won).
    */
  def readStats(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/stats")
      .agg(sum("n").cast("long").as("n"), sum("sdl").cast("long").as("sdl"),
        max("n_buckets").cast("long").as("n_buckets"))
      .withColumn("avgdl",
        col("sdl").cast("double") / col("n").cast("double"))

  /** Concurrency-safe append into `destDir` — shared staged-write idiom,
    * see [[graft.core.Fs.stagedAppend]]. Readers list the destination, so
    * each file becomes visible whole (per-file rename is atomic on
    * HDFS/local; on S3-family stores it is a copy, but the file only
    * lists at the destination once complete — the same visibility
    * contract either way).
    */
  private def stageInto(
      df: DataFrame, partCol: Option[String], destDir: String): Unit =
    graft.core.Fs.stagedAppend(df, partCol, destDir)

  /** Append a document batch to an existing index — the 100 TB shape is
    * append-only ingestion, not nightly rebuilds. New postings land in
    * the same `tb=` partitions (same hash, same bucket count, read from
    * the ledger) via staged atomic moves, and the batch's corpus counts
    * land as a NEW delta row in the stats ledger — nothing is read,
    * modified and rewritten, so interleaved appends commute and none is
    * lost (spec-proven with genuinely concurrent appends in Bm25Spec).
    * Postings are moved before the delta row, so a reader never sees a
    * batch counted in the stats that has no postings on disk — at worst
    * it scores fresh postings against slightly stale corpus totals,
    * which the next listing heals. Document frequencies are NOT stored —
    * [[scorePostings]] derives df from the probed postings at query time
    * — so an appended index serves exactly like a rebuilt one with no
    * maintenance step. Small files accumulate per partition; fold them
    * periodically with [[compactIndex]].
    */
  def appendToIndex(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      path: String): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    val nBuckets = spark.read.parquet(s"$path/stats")
      .agg(max("n_buckets")).as[Long].head()
    stageInto(
      postings(docs, idCol, textCol)
        .withColumn("tb", pmod(xxhash64(col("term")), lit(nBuckets))),
      Some("tb"), s"$path/postings")
    stageInto(
      corpusStats(docs, textCol).drop("avgdl")
        .withColumn("n_buckets", lit(nBuckets)).coalesce(1),
      None, s"$path/stats")
  }

  /** Per-term-bucket small-file compaction of an appended index —
    * delegates to [[LogCompactor]] over the `tb=` layout. Answers are
    * unchanged; file counts drop to ⌈bytes/target⌉ per bucket.
    */
  def compactIndex(
      spark: SparkSession,
      path: String,
      targetFileBytes: Long = 128L * 1024 * 1024)
      : Seq[LogCompactor.CompactionReport] =
    LogCompactor.compact(spark, s"$path/postings", targetFileBytes,
      partitionPrefix = "tb=")

  /** Fold the stats delta ledger's accumulated small files (one per
    * append) via [[LogCompactor.compactFlat]]. Rows are preserved
    * EXACTLY — the ledger's delta rows are summed by [[readStats]], so
    * even coincidentally identical deltas must survive compaction.
    */
  def compactStats(
      spark: SparkSession,
      path: String,
      targetFileBytes: Long = 128L * 1024 * 1024)
      : Option[LogCompactor.CompactionReport] =
    LogCompactor.compactFlat(spark, s"$path/stats", targetFileBytes)

  /** Probe the materialized index. The bucket ids for the query terms are
    * computed up front (a |query|-sized local job — model state, not
    * data) and pushed as literal partition filters, so the postings scan
    * reads ~|query terms|/nBuckets of the store; the term filter then
    * drops same-bucket strangers map-side.
    */
  def probeIndex(
      spark: SparkSession,
      path: String,
      idCol: String,
      terms: Seq[String],
      k1: String = "1.2",
      b: String = "0.75",
      topK: Int = 20): DataFrame = {
    import spark.implicits._
    val stats = readStats(spark, path)
    val nBuckets = stats.select(col("n_buckets")).as[Long].head()
    val buckets = spark.createDataset(terms)
      .select(pmod(xxhash64(col("value")), lit(nBuckets)))
      .as[Long].collect().distinct.toSeq
    val p = spark.read.parquet(s"$path/postings")
      .filter(col("tb").isin(buckets: _*))
      .drop("tb")
    scorePostings(p, stats.drop("n_buckets"), idCol, terms, k1, b, topK)
  }
}
