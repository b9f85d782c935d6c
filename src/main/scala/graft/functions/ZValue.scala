package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Morton (Z-order) code: round-robin bit-interleave of 2–4 dimension
  * ranks (each clamped to 16 bits) into one long sort key.
  *
  * Why: a table range-laid-out by ONE column prunes scans on that column
  * only. Interleaving the bits of several rank dimensions gives a single
  * sort key whose contiguous runs are small HYPER-RECTANGLES in rank
  * space — so files written in z-value order carry narrow min/max ranges
  * on EVERY interleaved column at once, and a stats-ledger box predicate
  * ([[graft.ops.StatsLedger]]) skips files for any of them. This is the
  * multi-dimensional clustering behind Delta/Iceberg `OPTIMIZE ZORDER BY`,
  * expressed as a plain deterministic expression: layout is just
  * `repartitionByRange(z).sortWithinPartitions(z)`.
  *
  * Input: `array<int>` of 2–4 per-dimension ranks, each in [0, 65535]
  * (callers scale raw values — see `ZOrder.rank16`). Null array or any
  * null/out-of-range element → null (layout callers coalesce first).
  * Purely bit arithmetic → whole-stage codegen via static call.
  */
case class ZValue(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  // introduces nulls beyond the child's (bad arity / null element /
  // out-of-range rank) — without this override the unsafe writers trust
  // child.nullable=false and turn our nulls into 0
  override def nullable: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "z_value"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"z_value expects array<int>, got ${other.sql}")
    }

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    ZValue.interleave(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val boxed = ctx.freshName("zv")
      s"""
         |java.lang.Long $boxed = graft.functions.ZValue.interleave($c);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ZValue =
    copy(child = newChild)
}

object ZValue {

  /** Codegen entry point. Returns null (boxed) on bad arity/nulls/range
    * so the expression stays null-safe rather than throwing mid-scan.
    */
  def interleave(arr: ArrayData): java.lang.Long = {
    val d = arr.numElements()
    if (d < 2 || d > 4) return null
    var i = 0
    while (i < d) {
      if (arr.isNullAt(i)) return null
      val v = arr.getInt(i)
      if (v < 0 || v > 0xffff) return null
      i += 1
    }
    var out = 0L
    var bit = 15
    while (bit >= 0) {
      var j = 0
      while (j < d) {
        out = (out << 1) | ((arr.getInt(j) >>> bit) & 1)
        j += 1
      }
      bit -= 1
    }
    // 4 dims fill all 64 bits: flip the sign bit so SIGNED long order
    // equals curve order (without this, cells with dim-0 rank >= 32768
    // sorted FIRST — a harmless but locality-breaking seam at the axis
    // midpoint: answers were never affected, file bounding boxes were)
    if (d == 4) out ^ java.lang.Long.MIN_VALUE else out
  }
}
