package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 16-bit SimHash of a token array: per token, a 60-bit md5-prefix hash;
  * bit `i` of the signature is set when strictly more than half the
  * tokens have bit `i` set in their hash (majority vote).
  *
  * Bit-identical to the composable form the DuckDB oracle mirrors:
  * `aggregate(transform(sequence(0,15), i -> case when
  *    2 * size(filter(th, h -> (h div 2^i) % 2 = 1)) > size(th) ...))`
  * — which walks the hash array 16 times through interpreted lambdas.
  * This expression hashes each token once and accumulates 16 bit
  * counters in a single pass.
  *
  * Duplicate tokens vote once each (multiset semantics, matching the
  * composable form). Null tokens are skipped and do not count toward
  * the majority threshold... they never occur in split() output.
  */
case class SimHash16(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash16"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash16 expects array<string>, got ${other.sql}")
    }

  override protected def nullSafeEval(v: Any): Any =
    SimHash16.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash16.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash16 =
    copy(child = newChild)
}

object SimHash16 {

  /** one pass: hash each token, bump 16 bit counters, majority-vote */
  def compute(arr: ArrayData): Long = computeBits(arr, 16)

  /** shared kernel for any signature width ≤ 60 (md5num supplies 60
    * usable bits)
    */
  def computeBits(arr: ArrayData, bits: Int): Long = {
    val n = arr.numElements()
    val ones = new Array[Int](bits)
    var total = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = Md5Prefix60.hash(arr.getUTF8String(i))
        var j = 0
        while (j < bits) {
          if (((h >>> j) & 1L) == 1L) ones(j) += 1
          j += 1
        }
        total += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < bits) {
      if (2 * ones(j) > total) sig |= (1L << j)
      j += 1
    }
    sig
  }
}

/** 60-bit SimHash — the production-width signature (16 bits collide by
  * luck at corpus scale: the 16-bit variant yields ~729k hamming≤3
  * pairs at sf0.1, the 60-bit variant at hamming≤5 yields only true
  * near-dups). Same one-pass kernel, all 60 bits the md5 prefix
  * provides.
  */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash60 expects array<string>, got ${other.sql}")
    }

  override protected def nullSafeEval(v: Any): Any =
    SimHash16.computeBits(v.asInstanceOf[ArrayData], 60)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SimHash16.computeBits($c, 60)")

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}
