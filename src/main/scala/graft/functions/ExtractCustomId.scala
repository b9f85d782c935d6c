package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** First tag with prefix `logger_custom_id:` → its suffix; else `''`
  * (reference tagging.py:85-98, prefix constant config.py:161).
  *
  * Implemented as a native Catalyst expression with codegen so it stays
  * inside whole-stage codegen — no UDF/serialization cost at 100 TB scale.
  * Never returns null: the "absent" sentinel is the empty string, matching
  * the reference's empty-string-not-null envelope semantics
  * (logger.py:170-171).
  */
case class ExtractCustomId(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String = "extract_custom_id"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"extract_custom_id expects array<string>, got ${other.sql}")
    }

  private lazy val prefix = UTF8String.fromString(ExtractCustomId.Prefix)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return UTF8String.EMPTY_UTF8
    val arr = v.asInstanceOf[ArrayData]
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        if (s.startsWith(prefix)) {
          return s.substring(prefix.numChars(), s.numChars())
        }
      }
      i += 1
    }
    UTF8String.EMPTY_UTF8
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val pref = ctx.addReferenceObj("prefix", prefix, classOf[UTF8String].getName)
    val arr = ctx.freshName("arr")
    val i = ctx.freshName("i")
    val n = ctx.freshName("n")
    val s = ctx.freshName("s")
    val code =
      code"""
        ${childGen.code}
        UTF8String ${ev.value} = UTF8String.EMPTY_UTF8;
        if (!${childGen.isNull}) {
          org.apache.spark.sql.catalyst.util.ArrayData $arr = ${childGen.value};
          int $n = $arr.numElements();
          for (int $i = 0; $i < $n; $i++) {
            if (!$arr.isNullAt($i)) {
              UTF8String $s = $arr.getUTF8String($i);
              if ($s.startsWith($pref)) {
                ${ev.value} = $s.substring($pref.numChars(), $s.numChars());
                break;
              }
            }
          }
        }
      """
    ev.copy(code = code, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): ExtractCustomId =
    copy(child = newChild)
}

object ExtractCustomId {
  val Prefix = "logger_custom_id:"

  /** Column-level entry point: `ExtractCustomId(tagsCol)`. */
  def apply(tags: Column): Column =
    graftshim.column(ExtractCustomId(graftshim.expression(tags)))
}
