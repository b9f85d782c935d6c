package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match subword tokenization (the WordPiece decode rule)
  * in one pass: for each word in the input array, repeatedly take the
  * longest vocabulary entry (length 4 → 3 → 2, by codepoints) matching at
  * the current position, falling back to the single codepoint, and emit
  * the flattened subword sequence across all words in order.
  *
  * The match rule is phrased EXACTLY as the DuckDB oracle replays it
  * (`COALESCE(CASE contains(substr(w,pos,4)) …, substr(w,pos,1))`): near
  * the end of a word the 4-codepoint probe yields the shorter remainder
  * string, so a match there is identical to probing the shorter length —
  * first-hit-wins over 4,3,2 therefore needs no explicit remaining-length
  * guards on either engine. All positions are codepoint-based (matching
  * substr semantics in both engines), so surrogate-pair text tokenizes
  * identically.
  *
  * The vocabulary arrives as a literal array column (`typedLit`), so the
  * same plan serves any trained vocab; the per-partition membership set is
  * memoized per thread keyed on the literal's identity (a literal evals to
  * the same ArrayData every row).
  */
case class VocabTokenize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "vocab_tokenize"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vocab_tokenize expects (array<string>, array<string>), got " +
          s"(${l.sql}, ${r.sql})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VocabTokenize.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val compute = "graft.functions.VocabTokenize.compute"
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $compute($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VocabTokenize =
    copy(left = newLeft, right = newRight)
}

object VocabTokenize {

  /** Max vocab-entry length probed (codepoints). Matches the training cap
    * in [[graft.ops.SubwordTokenizer]] and the oracle's CASE ladder.
    */
  val MaxLen = 4

  // literal vocab → same ArrayData instance every eval; memoize its set
  private val memo =
    new ThreadLocal[(ArrayData, java.util.HashSet[String])]()

  private def vocabSet(vocab: ArrayData): java.util.HashSet[String] = {
    val cached = memo.get()
    if (cached != null && (cached._1 eq vocab)) return cached._2
    val set = new java.util.HashSet[String](vocab.numElements() * 2)
    var i = 0
    while (i < vocab.numElements()) {
      if (!vocab.isNullAt(i)) set.add(vocab.getUTF8String(i).toString)
      i += 1
    }
    memo.set((vocab, set))
    set
  }

  def compute(words: ArrayData, vocab: ArrayData): ArrayData = {
    val set = vocabSet(vocab)
    val out = new java.util.ArrayList[Any]()
    var w = 0
    while (w < words.numElements()) {
      if (!words.isNullAt(w)) {
        val word = words.getUTF8String(w).toString
        val len = word.codePointCount(0, word.length)
        var pos = 0 // codepoint index
        var charPos = 0 // java char index of pos
        while (pos < len) {
          var tok: String = null
          var l = MaxLen
          while (tok == null && l >= 2) {
            val end = math.min(pos + l, len)
            val charEnd = word.offsetByCodePoints(charPos, end - pos)
            val cand = word.substring(charPos, charEnd)
            if (set.contains(cand)) tok = cand
            l -= 1
          }
          if (tok == null)
            tok = word.substring(charPos,
              word.offsetByCodePoints(charPos, 1))
          out.add(UTF8String.fromString(tok))
          val adv = tok.codePointCount(0, tok.length)
          pos += adv
          charPos = word.offsetByCodePoints(charPos, adv)
        }
      }
      w += 1
    }
    new GenericArrayData(out.toArray)
  }
}
