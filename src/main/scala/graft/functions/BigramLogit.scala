package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}

/** Hashed-bigram linear-model inference in one pass — the hot kernel of
  * the fasttext-style quality classifier (`q_quality_classifier`): for
  * each adjacent word pair, hash "a b" with the 60-bit md5 prefix
  * ([[Md5Prefix60]] identity), index `hash % weights.length` into the
  * weight table, and return the mean weight (the logit). Null when the
  * document has fewer than two words.
  *
  * Composable form this replaces (what the DuckDB oracle still runs):
  * `aggregate(transform(sequence(...), i -> md5num(concat_ws(' ',
  * w[i-1], w[i])) % D), ...)` — which allocates a concatenated string
  * and an index array per document and walks the words three times. One
  * buffered digest pass cuts the classifier ~2× at sf0.1.
  *
  * The weight table is a column (pass a `typedLit(Array[Double])`):
  * trained weights drop in without touching the kernel; the query's
  * derived stand-in weights are just one such literal.
  */
case class BigramLogit(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "bigram_logit"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bigram_logit expects (array<string>, array<double>), got " +
          s"(${l.sql}, ${r.sql})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    BigramLogit.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val compute = "graft.functions.BigramLogit.compute"
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      Object r = $compute($a, $b);
      if (r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ((Double) r).doubleValue(); }
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BigramLogit =
    copy(left = newLeft, right = newRight)
}

object BigramLogit {

  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Mean weight over hashed bigrams, summed left-to-right (matching the
    * oracle's sequential fold); null (boxed) when fewer than 2 words.
    */
  def compute(words: ArrayData, weights: ArrayData): java.lang.Double = {
    val total = words.numElements()
    val d = weights.numElements()
    if (total < 2 || d == 0) return null
    val md = digests.get()
    var sum = 0.0
    var i = 1
    while (i < total) {
      md.reset()
      if (!words.isNullAt(i - 1)) md.update(words.getUTF8String(i - 1).getBytes)
      md.update(' '.toByte)
      if (!words.isNullAt(i)) md.update(words.getUTF8String(i).getBytes)
      val dig = md.digest()
      val h = (((dig(0) & 0xffL) << 56) | ((dig(1) & 0xffL) << 48) |
        ((dig(2) & 0xffL) << 40) | ((dig(3) & 0xffL) << 32) |
        ((dig(4) & 0xffL) << 24) | ((dig(5) & 0xffL) << 16) |
        ((dig(6) & 0xffL) << 8) | (dig(7) & 0xffL)) >>> 4
      sum += weights.getDouble((h % d).toInt)
      i += 1
    }
    java.lang.Double.valueOf(sum / (total - 1))
  }
}
