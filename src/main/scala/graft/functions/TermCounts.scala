package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document term frequencies in ONE pass:
  * `array<struct<term string, tf bigint>>` in first-occurrence order.
  *
  * This replaces the `explode(words) → groupBy(doc, term).count()` head
  * of TF-IDF-style pipelines: the per-document multiset count is a local
  * (per-row) operation, so paying a full shuffle of every TOKEN
  * occurrence just to collapse duplicates within a document is pure
  * waste — the kernel collapses them in the projection, the explode
  * emits one row per DISTINCT term, and the first corpus-wide exchange
  * disappears entirely (document frequency and the per-doc argmax still
  * aggregate, but over the smaller distinct-term stream). At 100 TB the
  * deleted exchange is the largest shuffle in the query.
  */
case class TermCounts(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("term", StringType, nullable = false),
      StructField("tf", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "term_counts"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"term_counts expects array<string>, got ${t.sql}")
    }

  override protected def nullSafeEval(a: Any): Any =
    TermCounts.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val compute = "graft.functions.TermCounts.compute"
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $compute($a);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): TermCounts = copy(child = newChild)
}

object TermCounts {

  def compute(words: ArrayData): ArrayData = {
    val n = words.numElements()
    val counts = new java.util.LinkedHashMap[UTF8String, Array[Long]]()
    var i = 0
    while (i < n) {
      if (!words.isNullAt(i)) {
        val w = words.getUTF8String(i)
        val c = counts.get(w)
        if (c == null) counts.put(w.clone(), Array(1L)) else c(0) += 1L
      }
      i += 1
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      out(k) = InternalRow(e.getKey, e.getValue()(0))
      k += 1
    }
    new GenericArrayData(out)
  }
}
