package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document character n-gram (n = 1..4, codepoints) frequencies in
  * ONE pass: `array<struct<g string, c bigint>>` over all words of the
  * document — [[TermCounts]]'s local-collapse trick applied at the
  * character level for subword-vocabulary training.
  *
  * The exploded formulation (per-word transform/sequence explode →
  * corpus-wide groupBy) ships one row per gram OCCURRENCE into the
  * aggregate (~3 rows per character of corpus text); collapsing within
  * the document first means the explode emits one row per DISTINCT gram
  * per doc — a 5–10× row cut before the exchange, and the gram-cardinality
  * shuffle stays bounded by alphabet^4 after the map-side combine. Counts
  * are per-occurrence (identical totals to the exploded form), so the
  * trained vocabulary — and the DuckDB oracle replaying the occurrence
  * formulation — is unchanged.
  */
case class CharGramCounts(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("g", StringType, nullable = false),
      StructField("c", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "char_gram_counts"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"char_gram_counts expects array<string>, got ${t.sql}")
    }

  override protected def nullSafeEval(a: Any): Any =
    CharGramCounts.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val compute = "graft.functions.CharGramCounts.compute"
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $compute($a);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): CharGramCounts = copy(child = newChild)
}

object CharGramCounts {

  def compute(words: ArrayData): ArrayData = {
    val counts = new java.util.LinkedHashMap[String, Array[Long]]()
    var w = 0
    while (w < words.numElements()) {
      if (!words.isNullAt(w)) {
        val word = words.getUTF8String(w).toString
        val len = word.codePointCount(0, word.length)
        if (len > 0) {
          var pos = 0
          var charPos = 0
          while (pos < len) {
            var n = 1
            var charEnd = charPos
            while (n <= 4 && pos + n <= len) {
              charEnd = word.offsetByCodePoints(charEnd, 1)
              val g = word.substring(charPos, charEnd)
              val c = counts.get(g)
              if (c == null) counts.put(g, Array(1L)) else c(0) += 1L
              n += 1
            }
            charPos = word.offsetByCodePoints(charPos, 1)
            pos += 1
          }
        }
      }
      w += 1
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      out(k) = InternalRow(UTF8String.fromString(e.getKey), e.getValue()(0))
      k += 1
    }
    new GenericArrayData(out)
  }
}
