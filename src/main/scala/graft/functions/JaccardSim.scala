package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaccard similarity of two string arrays treated as sets:
  * `|a ∩ b| / |a ∪ b|` — the verify kernel of every near-dup operator
  * (n-gram Jaccard ground truth, MinHash-LSH candidate verification).
  *
  * Exists because the composable form
  * `size(array_intersect(a,b)) / size(array_union(a,b))` walks both
  * arrays twice and materializes two intermediate arrays per pair; this
  * expression computes both cardinalities in one hash-set pass and
  * returns the identical double (long counts → double division, same as
  * int-size → double cast → divide). Set semantics — duplicates and null
  * elements — exactly mirror `array_intersect`/`array_union`, so the
  * optimizer rule [[RewriteJaccard]] may substitute it freely.
  */
case class JaccardSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sim"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"jaccard_sim expects (array<string>, array<string>), got (${l.sql}, ${r.sql})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaccardSim.sim(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaccardSim.sim($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSim =
    copy(left = newLeft, right = newRight)
}

object JaccardSim {

  /** one hash-set pass; parity notes:
    *   - duplicates collapse (array_intersect/array_union are set ops)
    *   - a null element counts as one distinct value on each side
    *   - empty ∪ empty → 0/0 = NaN, matching double division
    */
  def sim(a: ArrayData, b: ArrayData): Double = {
    val setA = new java.util.HashSet[UTF8String]()
    var nullA = false
    val na = a.numElements()
    var i = 0
    while (i < na) {
      if (a.isNullAt(i)) nullA = true
      else setA.add(a.getUTF8String(i))
      i += 1
    }
    val setB = new java.util.HashSet[UTF8String]()
    var nullB = false
    var interNonNull = 0L
    val nb = b.numElements()
    var j = 0
    while (j < nb) {
      if (b.isNullAt(j)) nullB = true
      else {
        val v = b.getUTF8String(j)
        if (setB.add(v) && setA.contains(v)) interNonNull += 1
      }
      j += 1
    }
    val inter = interNonNull + (if (nullA && nullB) 1L else 0L)
    val union = setA.size.toLong + setB.size.toLong - interNonNull +
      (if (nullA || nullB) 1L else 0L)
    inter.toDouble / union.toDouble // 0/0 = NaN, same as the cast form
  }

  def apply(a: Column, b: Column): Column =
    graftshim.column(JaccardSim(graftshim.expression(a), graftshim.expression(b)))
}
