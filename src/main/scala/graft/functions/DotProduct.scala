package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Dot product of two double arrays, summed left-to-right — the hot
  * kernel of every vector operator (cosine KNN, IVF assignment,
  * embedding near-dup).
  *
  * Exists because Spark's higher-order route
  * (`aggregate(zip_with(a, b, (x,y) -> x*y), 0d, (acc,x) -> acc+x)`)
  * allocates an intermediate array and interprets the lambdas per
  * element. This expression is a primitive-typed codegen'd loop over
  * `ArrayData.getDouble` — no allocation, no virtual calls — and keeps
  * the exact left-to-right summation order, so results stay bit-identical
  * to the SQL comprehension the DuckDB oracle uses.
  *
  * Null handling: null input → null; null *elements* are treated as 0.0
  * contribution (vectors with null elements are malformed upstream).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_product expects (array<double>, array<double>), got (${l.sql}, ${r.sql})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    DotProduct.dot(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.DotProduct.dot($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {

  /** left-to-right summation; shared by eval and codegen */
  def dot(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        acc += x.getDouble(i) * y.getDouble(i)
      }
      i += 1
    }
    acc
  }

  def apply(a: Column, b: Column): Column =
    graftshim.column(DotProduct(graftshim.expression(a), graftshim.expression(b)))
}
