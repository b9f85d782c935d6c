package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Hilbert-curve index: map 2–4 dimension ranks (16 bits each) onto one
  * long sort key along a d-dimensional Hilbert space-filling curve.
  *
  * Why a second curve next to [[ZValue Morton]]: both turn contiguous
  * key runs into bounded hyper-rectangles (what file-level min/max
  * pruning needs), but Morton takes long diagonal jumps every time a
  * high interleaved bit flips, so a file's bounding box can span the
  * jump and balloon on every dimension at once. The Hilbert curve is
  * CONTINUOUS — consecutive indices are axis-neighbors (unit step in
  * exactly one dimension), the strongest locality any curve achieves —
  * so equal-count file cuts produce uniformly tighter boxes, i.e.
  * strictly better data skipping at the same write cost (one extra bit
  * transform per row, still codegen'd). This is the curve behind
  * Databricks liquid clustering and Iceberg's hilbert z-ordering;
  * HilbertCurveSpec measures the box-volume gap vs Morton directly.
  *
  * Algorithm: Skilling's axes→transpose transform ("Programming the
  * Hilbert curve", AIP Conf. Proc. 707, 2004 — public domain method):
  * undo the per-level rotations in place, Gray-encode, then bit-
  * interleave the transposed coordinates MSB-first exactly like Morton.
  * Purely register arithmetic → whole-stage codegen via a static call.
  *
  * Contract matches [[ZValue]]: input `array<int>` of 2–4 ranks in
  * [0, 65535]; null array / null element / bad arity / out-of-range →
  * null (hence the `nullable` override — see the ZValue note on unsafe
  * writers zeroing nulls otherwise). 4 dims fill all 64 bits, so the
  * sign bit is flipped to keep SIGNED long order equal to curve order
  * (Morton had the top half of dim 0 sorting first without this).
  */
case class HilbertValue(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_value"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"hilbert_value expects array<int>, got ${other.sql}")
    }

  override protected def nullSafeEval(v: Any): Any =
    HilbertValue.index(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val boxed = ctx.freshName("hv")
      s"""
         |java.lang.Long $boxed = graft.functions.HilbertValue.index($c);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HilbertValue =
    copy(child = newChild)
}

object HilbertValue {

  private final val Bits = 16

  /** Codegen entry point: null (boxed) on bad arity/nulls/range, else
    * the Hilbert distance of the cell, sign-flipped when d=4 so signed
    * long comparisons follow the curve.
    */
  def index(arr: ArrayData): java.lang.Long = {
    val d = arr.numElements()
    if (d < 2 || d > 4) return null
    val x = new Array[Int](d)
    var i = 0
    while (i < d) {
      if (arr.isNullAt(i)) return null
      val v = arr.getInt(i)
      if (v < 0 || v > 0xffff) return null
      x(i) = v
      i += 1
    }
    axesToTranspose(x)
    var out = 0L
    var bit = Bits - 1
    while (bit >= 0) {
      var j = 0
      while (j < d) {
        out = (out << 1) | ((x(j) >>> bit) & 1)
        j += 1
      }
      bit -= 1
    }
    if (d == 4) out ^ java.lang.Long.MIN_VALUE else out
  }

  /** Skilling's in-place transform: after it, interleaving x MSB-first
    * yields the Hilbert distance. Inverse ([[transposeToAxes]]) exists
    * for the spec's bijectivity/continuity proofs.
    */
  private[functions] def axesToTranspose(x: Array[Int]): Unit = {
    val n = x.length
    var q = 1 << (Bits - 1)
    // undo excess work
    while (q > 1) {
      val p = q - 1
      var i = 0
      while (i < n) {
        if ((x(i) & q) != 0) x(0) ^= p
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    // Gray encode
    var i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    var t = 0
    q = 1 << (Bits - 1)
    while (q > 1) {
      if ((x(n - 1) & q) != 0) t ^= q - 1
      q >>= 1
    }
    i = 0
    while (i < n) { x(i) ^= t; i += 1 }
  }

  /** Inverse of [[axesToTranspose]] (Skilling's TransposetoAxes) — used
    * only by the spec to walk the curve and prove unit-step continuity.
    */
  private[functions] def transposeToAxes(x: Array[Int]): Unit = {
    val n = x.length
    var t = x(n - 1) >>> 1
    var i = n - 1
    while (i > 0) { x(i) ^= x(i - 1); i -= 1 }
    x(0) ^= t
    var q = 2
    while (q != (1 << Bits)) {
      val p = q - 1
      i = n - 1
      while (i >= 0) {
        if ((x(i) & q) != 0) x(0) ^= p
        else { t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i -= 1
      }
      q <<= 1
    }
  }

  /** Spec helper: coordinates of curve position `h` in `d` dims. */
  private[functions] def axesOf(h: Long, d: Int): Array[Int] = {
    val raw = if (d == 4) h ^ java.lang.Long.MIN_VALUE else h
    val x = new Array[Int](d)
    var bit = Bits - 1
    var pos = d * Bits - 1
    while (bit >= 0) {
      var j = 0
      while (j < d) {
        x(j) |= (((raw >>> pos) & 1L).toInt << bit)
        pos -= 1
        j += 1
      }
      bit -= 1
    }
    transposeToAxes(x)
    x
  }
}
