package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** KLL quantile sketch aggregate (DataSketches `KllDoublesSketch`) — the
  * mergeable-quantiles leg next to `approx_percentile` and the HLL
  * distinct sketches: each partition folds its values into a constant-size
  * sketch, the shuffle carries sketch bytes, and the merge is associative,
  * so quantiles over 100 TB cost one map pass plus a tiny reduce. Unlike
  * `approx_percentile`'s summary (which Spark keeps internal), the KLL
  * sketch is EMITTED as a binary column: it can be stored per day/shard,
  * unioned later with [[KllMergeAgg]], and queried again — re-aggregation
  * without touching raw data (the property [[KllMergeSpec]] pins).
  *
  * `k` controls accuracy: normalized rank error ≈ 1.65% at the default
  * k=200. KLL compaction is randomized, so two runs can emit bytewise
  * different sketches with the same rank guarantees — queries exposing
  * sketch results are rows-only checks with rank-contract bound columns,
  * never value oracles.
  */
case class KllSketchAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs DOUBLE input, got ${child.dataType}")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(
      buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def merge(
      buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other)
    buf
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllSketchAgg =
    copy(child = newChild)
  override def prettyName: String = "kll_sketch_agg"
}

/** Merge aggregate over SERIALIZED KLL sketches: unions pre-built sketch
  * columns (per-day, per-shard) into one — the re-aggregation path that
  * makes stored sketches worth storing.
  */
case class KllMergeAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs BINARY (serialized sketch) input, got ${child.dataType}")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(
      buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      buf.merge(KllDoublesSketch.heapify(
        Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }

  override def merge(
      buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other)
    buf
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllMergeAgg =
    copy(child = newChild)
  override def prettyName: String = "kll_merge_agg"
}

/** Quantile at normalized rank `p` from a serialized KLL sketch. Scalar
  * accessor over already-aggregated rows (one per group), so
  * CodegenFallback costs nothing measurable.
  */
case class KllQuantile(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs (BINARY, DOUBLE), got (${left.dataType}, ${right.dataType})")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(bin: Any, p: Any): Any = {
    val sk = KllDoublesSketch.wrap(Memory.wrap(bin.asInstanceOf[Array[Byte]]))
    if (sk.isEmpty) null else sk.getQuantile(p.asInstanceOf[Double])
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllQuantile =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "kll_sketch_quantile"
}

/** Normalized rank of `value` in a serialized KLL sketch (the inverse of
  * [[KllQuantile]]) — used by the rank-contract bound columns.
  */
case class KllRank(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs (BINARY, DOUBLE), got (${left.dataType}, ${right.dataType})")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(bin: Any, v: Any): Any = {
    val sk = KllDoublesSketch.wrap(Memory.wrap(bin.asInstanceOf[Array[Byte]]))
    if (sk.isEmpty) null else sk.getRank(v.asInstanceOf[Double])
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllRank =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "kll_sketch_rank"
}
