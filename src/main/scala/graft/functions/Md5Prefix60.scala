package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 60-bit deterministic content hash: the first 15 hex characters of
  * md5(input) as a non-negative long — equivalently, the first 60 bits of
  * the digest (`bigEndian(first 8 bytes) >>> 4`).
  *
  * Exists because the composable form
  * `conv(substr(md5(x),1,15),16,10)::bigint` round-trips through a hex
  * string and BigInteger parse per row — measurably dominant in shingle
  * hashing (minhash/simhash/fingerprints hash every shingle of every
  * document). This native expression goes digest→long directly, stays in
  * whole-stage codegen, and matches DuckDB's
  * `('0x' || substr(md5(x),1,15))::BIGINT` bit-for-bit.
  */
case class Md5Prefix60(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "md5num"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"md5num expects string, got ${other.sql}")
    }

  override protected def nullSafeEval(v: Any): Any =
    Md5Prefix60.hash(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Md5Prefix60.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix60 =
    copy(child = newChild)
}

object Md5Prefix60 {

  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** first 60 bits of md5, as a non-negative long (codegen entry point) */
  def hash(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
      ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
  }

  def apply(c: Column): Column =
    graftshim.column(Md5Prefix60(graftshim.expression(c)))
}
