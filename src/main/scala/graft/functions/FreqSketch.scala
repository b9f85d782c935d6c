package graft.functions

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Frequent-items ("heavy hitters") sketch aggregate on DataSketches'
  * `ItemsSketch[String]` — the third sketch leg next to HLL (distinct)
  * and KLL (quantiles): approximate top-k items over unbounded
  * cardinality in ONE pass with O(maxMapSize) memory per group.
  *
  * Why this is the 100 TB shape for "top tokens/domains/users": an exact
  * top-k needs a full groupBy over every distinct item (shuffle ∝
  * cardinality); the sketch folds each partition's stream into a bounded
  * map, the shuffle carries sketch bytes, the merge is associative, and
  * the answer comes with DETERMINISTIC error bounds — for any item,
  * lower_bound ≤ true_count ≤ upper_bound always holds, and every item
  * with true count > N/maxMapSize (roughly) is guaranteed present
  * (NO_FALSE_NEGATIVES). Estimates can vary with merge order, so queries
  * exposing them are rows-only with bound-contract columns, never value
  * oracles — same policy as the KLL/HLL queries.
  *
  * `maxMapSize` must be a power of 2 (DataSketches requirement); 128
  * gives ≤ ~0.9% of stream length worst-case error.
  */
case class FreqSketchAgg(
    child: Expression,
    maxMapSize: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs STRING input, got ${child.dataType}")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(
      buf: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(
      buf: ItemsSketch[String],
      other: ItemsSketch[String]): ItemsSketch[String] = {
    buf.merge(other)
    buf
  }

  override def eval(buf: ItemsSketch[String]): Any =
    buf.toByteArray(new ArrayOfStringsSerDe)

  override def serialize(buf: ItemsSketch[String]): Array[Byte] =
    buf.toByteArray(new ArrayOfStringsSerDe)
  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), new ArrayOfStringsSerDe)

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqSketchAgg =
    copy(child = newChild)
  override def prettyName: String = "freq_sketch_agg"
}

/** Merge aggregate over SERIALIZED frequent-items sketches — union of
  * per-day/per-shard stored sketches, the re-aggregation path.
  */
case class FreqMergeAgg(
    child: Expression,
    maxMapSize: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs BINARY (serialized sketch) input, got ${child.dataType}")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(
      buf: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null)
      buf.merge(ItemsSketch.getInstance(
        Memory.wrap(v.asInstanceOf[Array[Byte]]), new ArrayOfStringsSerDe))
    buf
  }

  override def merge(
      buf: ItemsSketch[String],
      other: ItemsSketch[String]): ItemsSketch[String] = {
    buf.merge(other)
    buf
  }

  override def eval(buf: ItemsSketch[String]): Any =
    buf.toByteArray(new ArrayOfStringsSerDe)

  override def serialize(buf: ItemsSketch[String]): Array[Byte] =
    buf.toByteArray(new ArrayOfStringsSerDe)
  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), new ArrayOfStringsSerDe)

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqMergeAgg =
    copy(child = newChild)
  override def prettyName: String = "freq_merge_agg"
}

private[functions] object FreqSketchOps {
  def wrap(bin: Any): ItemsSketch[String] =
    ItemsSketch.getInstance(
      Memory.wrap(bin.asInstanceOf[Array[Byte]]), new ArrayOfStringsSerDe)
}

/** Estimated count of `item` in a serialized frequent-items sketch. */
case class FreqEstimate(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs (BINARY, STRING), got (${left.dataType}, ${right.dataType})")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullSafeEval(bin: Any, item: Any): Any =
    FreqSketchOps.wrap(bin).getEstimate(item.asInstanceOf[UTF8String].toString)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FreqEstimate =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "freq_sketch_estimate"
}

/** Guaranteed lower bound on an item's true count. */
case class FreqLowerBound(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs (BINARY, STRING), got (${left.dataType}, ${right.dataType})")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullSafeEval(bin: Any, item: Any): Any =
    FreqSketchOps.wrap(bin)
      .getLowerBound(item.asInstanceOf[UTF8String].toString)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FreqLowerBound =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "freq_sketch_lb"
}

/** Guaranteed upper bound on an item's true count. */
case class FreqUpperBound(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs (BINARY, STRING), got (${left.dataType}, ${right.dataType})")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullSafeEval(bin: Any, item: Any): Any =
    FreqSketchOps.wrap(bin)
      .getUpperBound(item.asInstanceOf[UTF8String].toString)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FreqUpperBound =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "freq_sketch_ub"
}

/** Highest-estimate item in the sketch (null when empty) — ties broken
  * by item order for determinism.
  */
case class FreqTop1(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs BINARY input, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(bin: Any): Any = {
    val rows = FreqSketchOps.wrap(bin)
      .getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
    if (rows.isEmpty) null
    else {
      val best = rows.minBy(r => (-r.getEstimate, r.getItem))
      UTF8String.fromString(best.getItem)
    }
  }
  override protected def withNewChildInternal(newChild: Expression): FreqTop1 =
    copy(child = newChild)
  override def prettyName: String = "freq_sketch_top1"
}
