package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Fixed-point gram-matrix aggregate: folds every `array<double>` row
  * into a d×d matrix of `sum(floor(x_i·x_j·1e9))` longs — the exact sums
  * [[graft.ops.Pca]] needs, without materializing d² cells per row.
  *
  * The naive formulation (explode d² named_structs per row, then
  * groupBy(i,j).sum) is semantically identical but pays tuple
  * materialization and hash-aggregate probing on rows×d² records; this
  * aggregate runs the same arithmetic as a tight array loop per row, and
  * the only thing that ever moves is one d²-long buffer per partition.
  * Bit-equivalence with the exploded form (pinned in `PcaSpec`) holds
  * because each cell contribution is the same IEEE product + floor +
  * non-ANSI double→long cast (NaN → 0, saturating), long addition is
  * associative-commutative, and the gram term is symmetric
  * (floor(x_i·x_j·s) = floor(x_j·x_i·s) exactly), so the upper triangle
  * is computed once and mirrored.
  *
  * Null vectors contribute nothing; a null ELEMENT voids just the cells
  * it touches (the exploded form's `sum` ignores null `fx`); rows longer
  * than `d` only contribute their first `d` components.
  */
case class GramAgg(
    child: Expression,
    d: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  private val scale = graft.ops.Pca.Scale.toDouble

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs ARRAY<DOUBLE> input, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] = new Array[Long](d * d)

  private def fx(xi: Double, xj: Double): Long = {
    val p = math.floor(xi * xj * scale)
    if (p.isNaN) 0L
    else if (p >= Long.MaxValue.toDouble) Long.MaxValue
    else if (p <= Long.MinValue.toDouble) Long.MinValue
    else p.toLong
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val n = math.min(arr.numElements(), d)
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val xi = arr.getDouble(i)
          buf(i * d + i) += fx(xi, xi)
          var j = i + 1
          while (j < n) {
            if (!arr.isNullAt(j)) {
              val c = fx(xi, arr.getDouble(j))
              buf(i * d + j) += c
              buf(j * d + i) += c
            }
            j += 1
          }
        }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): GramAgg =
    copy(child = newChild)
  override def prettyName: String = "gram_agg"
}
