package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic subword tokenizer — the real-tokenizer upgrade of the
  * whitespace/regex token counting in `q_token_count`: train a bounded
  * subword vocabulary from the corpus, then encode every document with
  * greedy longest-match (the WordPiece inference rule, executed by the
  * native [[graft.functions.VocabTokenize]] kernel).
  *
  * Training is frequency-based vocabulary induction: count every char
  * n-gram (n = 2..4, codepoints) over all word occurrences, keep the
  * top-k by (count DESC, gram ASC) — a total order, so the vocabulary is
  * reproducible cross-engine — and union all observed single codepoints
  * so encoding can never fail. This is the WordPiece/BPE-family
  * *selection* step without the iterative merge loop: one aggregate
  * instead of k sequential corpus passes, which is the right trade at
  * 100 TB (merge-loop BPE needs k global barriers; frequency induction
  * needs one shuffle of bounded-cardinality grams with map-side combine).
  *
  * Scale shape: training shuffles (gram, count) pairs — cardinality
  * bounded by alphabet^4, with map-side combine; the top-k is a
  * TakeOrdered. The trained vocab is model state (≤ k + alphabet
  * entries), broadcast as a literal into the map-only encode projection.
  */
object SubwordTokenizer {

  /** Train the vocabulary: all observed single codepoints ∪ top-k
    * n-grams (n = 2..4) by (count DESC, gram ASC). Bounded model state —
    * the collect is ≤ k + alphabet strings.
    *
    * One corpus pass: the native [[graft.functions.CharGramCounts]]
    * kernel collapses gram occurrences per document in the projection,
    * so the exchange carries one row per distinct gram per doc (not per
    * occurrence), and the aggregated frame — vocabulary-sized, bounded
    * by alphabet^4 — serves both the top-k selection and the singles
    * set. Counts are identical to the per-occurrence formulation the
    * oracle replays.
    */
  def trainVocab(docs: DataFrame, textCol: String, k: Int): Seq[String] = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val grams = docs.filter(col(textCol).isNotNull)
      .select(explode(expr(s"char_gram_counts(split($textCol, ' '))"))
        .as("gc"))
      .groupBy(col("gc.g").as("g")).agg(sum("gc.c").as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val top = grams.filter(length(col("g")) >= 2)
      .orderBy(col("c").desc, col("g"))
      .limit(k)
      .select("g").as[String].collect().toSeq
    val singles = grams.filter(length(col("g")) === 1)
      .select("g").as[String].collect().toSeq
    grams.unpersist()
    (singles ++ top).distinct.sorted
  }

  /** Encode: adds `toks` (flattened subword array) from the literal
    * vocabulary — map-only, no shuffle at any scale.
    */
  def tokenize(
      docs: DataFrame,
      textCol: String,
      vocab: Seq[String]): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(docs.sparkSession)
    docs.withColumn("toks",
      call_function("vocab_tokenize",
        split(col(textCol), " "), typedLit(vocab)))
  }
}
