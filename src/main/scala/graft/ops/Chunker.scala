package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document chunking for training-data assembly: fixed word windows with
  * overlap, each chunk carrying provenance (source id + chunk index).
  *
  * This is the canonical pre-tokenization step of an LLM data pipeline —
  * long documents become `chunkWords`-word windows advanced by `stride`
  * words (overlap = chunkWords − stride keeps context across
  * boundaries), and every chunk stays joinable back to its source for
  * dedup/quality propagation (near-dup removal is typically run on
  * chunks, quality filters on documents; both need the id/idx edge).
  *
  * Scale shape: one projection — split once, then a per-row `transform`
  * over the start indices and one `explode`. No shuffle, no UDF; output
  * rows ≈ input words / stride, partitioning inherited from the scan.
  * The word array is materialized in its own projection first so the
  * higher-order `transform` does not re-split the text per element
  * (interpreted lambdas get no CSE — the measured O(n²) trap).
  */
object Chunker {

  /** Chunk `textCol` into windows. Output: all of `df`'s columns except
    * the text, plus (chunk_idx, chunk, n_words).
    */
  def chunk(
      df: DataFrame,
      textCol: String,
      chunkWords: Int = 20,
      stride: Int = 15): DataFrame = {
    require(stride > 0 && stride <= chunkWords,
      s"need 0 < stride <= chunkWords, got stride=$stride words=$chunkWords")
    val keep = df.columns.filterNot(_ == textCol).map(col).toSeq
    df.select(keep :+ split(col(textCol), " ").as("__w"): _*)
      .filter(size(col("__w")) > 0)
      .select(keep :+ posexplode(expr(
        s"""transform(
              sequence(0, cast(ceil(size(__w) / cast($stride as double)) as int) - 1),
              i -> struct(
                concat_ws(' ', slice(__w, i * $stride + 1, $chunkWords)) AS chunk,
                size(slice(__w, i * $stride + 1, $chunkWords)) AS n_words))""")): _*)
      .withColumnRenamed("pos", "chunk_idx")
      .select(keep ++ Seq(col("chunk_idx").cast("long"),
        col("col.chunk").as("chunk"),
        col("col.n_words").cast("long").as("n_words")): _*)
  }
}
