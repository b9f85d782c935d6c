package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Train/eval decontamination: suppress corpus documents that near-match
  * any document in an evaluation set, so benchmark answers cannot leak
  * into training data.
  *
  * Scale shape (100 TB corpus, small eval set): the EVAL side is the one
  * that gets shingled, minhash-signed, banded, and BROADCAST — the corpus
  * is only ever scanned map-side. Each corpus partition computes its own
  * shingles/signature/bands with the native codegen'd `minhash_sig`
  * expression, probes the broadcast eval bands, and verifies exact
  * n-gram Jaccard against the broadcast eval shingle sets immediately,
  * inside the same map stage (a pair sharing k≤4 bands is verified k
  * times and deduplicated afterwards — bounded extra map work instead of
  * a candidate shuffle). The ONLY shuffle in the whole operator is the
  * final `distinct` over pairs that PASSED the threshold — the
  * contaminated set, vanishingly small next to the corpus.
  *
  * Banding follows the dedup family (16 minhashes, 4 bands × 4 rows —
  * see [[graft.functions.MinHashSig]]); candidates are band collisions,
  * verification is exact Jaccard over distinct 3-gram word shingles, so
  * the result is deterministic and oracle-checkable (`q_decontaminate`
  * mirrors the banding in DuckDB SQL).
  */
object Decontaminate {

  /** (id, shingle-set, minhash band) rows for one side. */
  private def banded(
      df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("_id"), split(col(textCol), " ").as("w"))
      .filter(expr("size(w) >= 3"))
      .select(col("_id"),
        expr("""array_distinct(transform(
                  sequence(1, size(w) - 2),
                  i -> concat_ws(' ', slice(w, i, 3))))""").as("s"))
      .select(col("_id"), col("s"), expr("minhash_sig(s)").as("sig"))
      .select(col("_id"), col("s"),
        posexplode(expr(
          "transform(sequence(0, 3), b -> slice(sig, b * 4 + 1, 4))")))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bvals")

  /** Contaminated (corpus id, eval id, jaccard) pairs: band collision
    * against the broadcast eval side, then exact Jaccard ≥ `threshold`.
    * Column names in the result: `idCol`, `eval_id`, `jaccard`.
    */
  def pairs(
      corpus: DataFrame,
      evalSet: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.5): DataFrame = {
    val ev = banded(evalSet, idCol, textCol)
      .select(col("_id").as("_eid"), col("s").as("_es"),
        col("band"), col("bvals"))
    banded(corpus, idCol, textCol)
      .join(broadcast(ev), Seq("band", "bvals"))
      .withColumn("jac",
        size(array_intersect(col("s"), col("_es"))).cast("double")
          / size(array_union(col("s"), col("_es"))).cast("double"))
      .filter(col("jac") >= threshold)
      .select(col("_id").as(idCol), col("_eid").as("eval_id"),
        round(col("jac"), 6).as("jaccard"))
      .distinct()
  }

  /** Exact n-gram contamination (the GPT-3/PaLM-style decontamination
    * rule): a corpus document is contaminated iff it shares at least one
    * exact word n-gram with any eval document. Complements [[pairs]]:
    * minhash banding catches near-duplicate PASSAGES, the exact-gram rule
    * catches verbatim eval SNIPPETS quoted inside otherwise-unrelated
    * documents (a 0.5-Jaccard threshold never fires on those).
    *
    * Scale shape: the eval side collapses to its distinct gram set —
    * small, broadcast once. The corpus explodes to (doc_id, gram)
    * map-side and probes the broadcast hash table; only MATCHING pairs
    * reach the per-doc count shuffle, so corpus bytes shuffled is
    * proportional to contamination found, not corpus size.
    *
    * Returns (idCol, n_grams, n_hit_grams, hit_ratio) for contaminated
    * documents only. Grams are distinct-per-document, so `n_hit_grams`
    * counts distinct shared grams and `hit_ratio` is a containment-style
    * score in (0, 1].
    */
  /** (_id, g: distinct 60-bit digests of the word n-grams) rows — shared
    * by the batch and streaming exact-gram probes. Grams travel as
    * 8-byte md5-prefix digests (native one-pass
    * [[graft.functions.ShingleHashes]] kernel), not strings: the
    * explode, the broadcast hash table, and every joined row carry longs,
    * which cut the probe's wall time ~4× versus concat_ws-built gram
    * strings. Digest identity with `md5num(gram)` keeps the DuckDB
    * oracle exact.
    */
  private def wordGrams(
      df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    df.select(col(idCol).as("_id"),
        expr(s"shingle_hashes(split($textCol, ' '), $n)").as("g"))
      .filter(size(col("g")) > 0)
  }

  def exactGramHits(
      corpus: DataFrame,
      evalSet: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 5): DataFrame = {
    def grams(df: DataFrame): DataFrame = wordGrams(df, idCol, textCol, n)
    val evalGrams = grams(evalSet)
      .select(explode(col("g")).as("gram")).distinct()
    grams(corpus)
      .select(col("_id"), size(col("g")).cast("long").as("n_grams"),
        explode(col("g")).as("gram"))
      .join(broadcast(evalGrams), Seq("gram"))
      .groupBy(col("_id").as(idCol), col("n_grams"))
      .agg(count(lit(1)).as("n_hit_grams"))
      .select(col(idCol), col("n_grams"), col("n_hit_grams"),
        round(col("n_hit_grams").cast("double")
          / col("n_grams").cast("double"), 6).as("hit_ratio"))
  }

  /** Streaming exact-gram decontamination: the same probe as
    * [[exactGramHits]], applied to a STREAMING corpus. The eval side is a
    * STATIC frame, so Spark plans a stateless stream-static broadcast
    * join — each arriving micro-batch is scrubbed map-side with ZERO
    * streaming state (no watermark, no state store), which is the shape
    * that lets a 100 TB/day ingest firehose be decontaminated inline at
    * file-arrival time instead of by a nightly batch sweep.
    *
    * Returns the stream of (idCol, gram) collision rows — one row per
    * (document, shared gram). Per-document aggregation is deliberately
    * left to the caller's `foreachBatch` (batch-side `distinct`/`groupBy`
    * over the micro-batch's hits), keeping THIS operator append-mode and
    * state-free.
    */
  def streamGramFlags(
      corpusStream: DataFrame,
      evalSet: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 5): DataFrame = {
    val evalGrams = wordGrams(evalSet, idCol, textCol, n)
      .select(explode(col("g")).as("gram")).distinct()
    wordGrams(corpusStream, idCol, textCol, n)
      .select(col("_id").as(idCol), explode(col("g")).as("gram"))
      .join(broadcast(evalGrams), Seq("gram"))
      .select(col(idCol), col("gram"))
  }

  /** The corpus minus every document contaminated by the eval set. The
    * suppression list is a broadcast anti-join key set — the corpus again
    * stays un-shuffled.
    */
  def clean(
      corpus: DataFrame,
      evalSet: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.5): DataFrame = {
    val dirty = pairs(corpus, evalSet, idCol, textCol, threshold)
      .select(col(idCol)).distinct()
    corpus.join(broadcast(dirty), Seq(idCol), "left_anti")
  }
}
