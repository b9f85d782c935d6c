package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training: concatenate documents into
  * fixed-token-budget training sequences (contiguous fill). Every
  * pre-training pipeline ends with this step — the model consumes dense
  * `budget`-token sequences, not ragged documents.
  *
  * Semantics (deterministic, order-defined): within each stream partition
  * (`streamCols`), documents are laid end-to-end in `orderCols` order;
  * a document belongs to the sequence its FIRST token lands in
  * (`seq_idx = tokens_before div budget`). A document longer than the
  * budget stays whole (real packers split it across sequences; keeping
  * assignment whole-doc makes the operator a pure partition+index
  * computation, and the split is a downstream `posexplode` over
  * `seq_offset`). The final sequence of each stream is a partial fill.
  *
  * Scale shape: one window sort per stream partition — the stream key
  * (source, language, date-shard, ...) bounds the sort. At 100 TB you
  * pack per (source, shard) so no single window exceeds a shard; the
  * query surface (`q_pack_sequences`) demonstrates exactly that with a
  * (lang, doc_id-range shard) key. No shuffle beyond the one window
  * exchange; cumulative sums are per-partition, never global.
  */
object SequencePacker {

  /** Adds `seq_idx` (which sequence this doc starts in, per stream) and
    * `seq_offset` (token offset inside that sequence).
    */
  def pack(
      docs: DataFrame,
      tokenCol: String,
      budget: Int,
      streamCols: Seq[String],
      orderCols: Seq[String]): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val w = Window.partitionBy(streamCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("_tokens_before",
        coalesce(sum(col(tokenCol)).over(w), lit(0L)))
      .withColumn("seq_idx", expr(s"_tokens_before div $budget"))
      .withColumn("seq_offset", col("_tokens_before") % budget)
      .drop("_tokens_before")
  }

  /** Per-sequence accounting: docs packed, token fill, fill ratio. */
  def sequenceStats(
      packed: DataFrame,
      tokenCol: String,
      budget: Int,
      streamCols: Seq[String]): DataFrame =
    packed
      .groupBy((streamCols.map(col) :+ col("seq_idx")): _*)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col(tokenCol)).as("seq_tokens"),
        min("seq_offset").as("start_offset"))
      .withColumn("fill_ratio",
        round(least(col("seq_tokens"), lit(budget)).cast("double")
          / budget, 6))
}
