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

  /** Char n-grams (2..4) of a word, as a SQL fragment over column `word`
    * — empty per-n slice when the word is shorter than n (mirroring the
    * oracle's empty generate_series, NOT a truncated full-word gram).
    */
  private val gramsExpr =
    """flatten(transform(sequence(2, 4), n ->
         if(length(word) >= n,
            transform(sequence(1, length(word) - n + 1),
                      i -> substring(word, i, n)),
            array_remove(array(''), ''))))"""

  /** Train the vocabulary: all observed single codepoints ∪ top-k
    * n-grams (n = 2..4) by (count DESC, gram ASC). Bounded model state —
    * the collect is ≤ k + alphabet strings.
    */
  def trainVocab(docs: DataFrame, textCol: String, k: Int): Seq[String] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = docs.filter(col(textCol).isNotNull)
      .select(explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
    val top = words
      .select(explode(expr(gramsExpr)).as("g"))
      .groupBy("g").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("g"))
      .limit(k)
      .select("g").as[String].collect().toSeq
    val singles = words
      .select(explode(expr(
        "transform(sequence(1, length(word)), i -> substring(word, i, 1))"))
        .as("g"))
      .distinct().as[String].collect().toSeq
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
