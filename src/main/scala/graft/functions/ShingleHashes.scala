package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** ALL distinct 60-bit md5 digests of the n-gram word shingles of a word
  * array, in first-occurrence order — the sibling of [[MinShingleHash]]
  * (which keeps only the minimum) for operators that need the full gram
  * set as joinable 8-byte keys: exact n-gram decontamination probes a
  * broadcast eval gram set, and hashing turns each ~n·wordlen-byte gram
  * string into one long BEFORE the join, so the explode, the broadcast
  * hash table, and the matched-pair shuffle all carry longs.
  *
  * Equivalent composable form (what the DuckDB oracle runs):
  * `list_distinct([md5num(concat_ws(' ', slice(w, i, n))) ...])` —
  * hash identity with `md5num` / [[Md5Prefix60]] (md5 over the UTF-8
  * bytes of the space-joined shingle, top 60 bits), so a cross-engine
  * join on the digests equals a join on the gram strings up to 60-bit
  * md5 collisions — and since BOTH engines compare digests, the oracle
  * hash-match is exact even then.
  *
  * Returns an empty array when the input holds fewer than n words.
  */
case class ShingleHashes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"shingle_hashes expects (array<string>, int), got (${l.sql}, ${r.sql})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ShingleHashes.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val compute = "graft.functions.ShingleHashes.compute"
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      ${ev.value} = $compute($a, $b);
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ShingleHashes =
    copy(left = newLeft, right = newRight)
}

object ShingleHashes {

  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Distinct 60-bit digest prefixes of every n-shingle, first-occurrence
    * order; empty when fewer than n words.
    */
  def compute(words: ArrayData, n: Int): ArrayData = {
    val total = words.numElements()
    if (n <= 0 || total < n)
      return new GenericArrayData(Array.emptyLongArray)
    val md = digests.get()
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
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
      seen.add(java.lang.Long.valueOf(h))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next().longValue(); k += 1 }
    new GenericArrayData(out)
  }
}
