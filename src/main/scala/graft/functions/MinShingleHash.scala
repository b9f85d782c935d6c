package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** Minimum 60-bit md5 hash over all n-gram word shingles of a word
  * array — the winnowing-style document fingerprint kernel.
  *
  * Equivalent composable form (what the DuckDB oracle runs):
  * `array_min(transform(sequence(1, size(w)-n+1),
  *    i -> md5num(concat_ws(' ', slice(w, i, n)))))`
  * — which, interpreted, allocates a sliced array plus a concatenated
  * string per shingle. This expression walks the word array once with a
  * reusable byte buffer: each shingle's bytes are appended (space-
  * separated) and digested without materializing intermediate arrays or
  * UTF8Strings. Hash identity: md5 over the UTF-8 bytes of the
  * space-joined shingle — bit-identical to `md5num(concat_ws(' ', ...))`.
  *
  * Returns null when the array holds fewer than n words (callers branch
  * to a whole-text hash, mirroring the oracle's CASE).
  */
case class MinShingleHash(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "min_shingle_hash"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"min_shingle_hash expects (array<string>, int), got (${l.sql}, ${r.sql})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    MinShingleHash.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val compute = "graft.functions.MinShingleHash.compute"
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      Object r = $compute($a, $b);
      if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = ((Long) r).longValue(); }
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinShingleHash =
    copy(left = newLeft, right = newRight)
}

object MinShingleHash {

  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** null (boxed) when fewer than n words; else min 60-bit digest prefix */
  def compute(words: ArrayData, n: Int): java.lang.Long = {
    val total = words.numElements()
    if (n <= 0 || total < n) return null
    val md = digests.get()
    var min = Long.MaxValue
    var i = 0
    while (i <= total - n) {
      md.reset()
      var j = 0
      while (j < n) {
        if (j > 0) md.update(' '.toByte)
        if (!words.isNullAt(i + j)) md.update(words.getUTF8String(i + j).getBytes)
        j += 1
      }
      val d = md.digest()
      val h = (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
        ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
        ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
      if (h < min) min = h
      i += 1
    }
    java.lang.Long.valueOf(min)
  }
}
