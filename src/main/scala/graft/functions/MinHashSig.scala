package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 16-slot MinHash signature of a shingle set, in one pass.
  *
  * Semantics (bit-identical to the DuckDB oracle in
  * `graft.queries.DedupQueries`): per shingle `x`, the base hash is
  * `md5num(x) % P` (P = 2^31 − 1); slot `j` of the signature is
  * `min over x of (A(j)·base + B(j)) % P` — the classic affine MinHash
  * family. `A(j) < 2^26`, `base < 2^31`, so the product stays well inside
  * a signed 64-bit long.
  *
  * Exists because the composable form —
  * `transform(sequence(0,15), j -> array_min(transform(bases, h -> ...)))`
  * — runs interpreted (higher-order functions sit outside whole-stage
  * codegen) and allocates 16 intermediate arrays per document. Minhashing
  * is O(shingles × hashes) per document and dominates the dedup pipeline;
  * this expression keeps it a single allocation-free loop that stays
  * inside codegen. Mirrors the reference's role of content hashing at
  * ingest (langchain_callback_parquet_logger/logger.py:442-473 builds
  * columnar batches; we hash them) — re-expressed as a Catalyst scalar.
  *
  * Empty input (no shingles) yields slots of Long.MaxValue; callers
  * filter to ≥3-word documents, so that case never reaches the oracle.
  */
case class MinHashSig(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig expects array<string>, got ${other.sql}")
    }

  override protected def nullSafeEval(v: Any): Any =
    MinHashSig.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashSig.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {

  /** modulus of the affine hash family: the Mersenne prime 2^31 − 1 */
  val P: Long = 2147483647L

  /** multipliers (primes, < 2^26 so A·base never overflows a long) */
  val A: Array[Long] = Array(1769021L, 3043321L, 4987523L, 6291469L,
    7368787L, 9437189L, 11823443L, 13007111L, 15485863L, 17825791L,
    19891591L, 23456789L, 25165843L, 27644437L, 29986577L, 32452843L)

  /** offsets */
  val B: Array[Long] = Array(12289L, 24593L, 49157L, 98317L, 196613L,
    393241L, 786433L, 1572869L, 3145739L, 6291469L, 12582917L, 25165843L,
    50331653L, 100663319L, 201326611L, 402653189L)

  val NumHashes: Int = A.length

  /** codegen entry point: one pass over the shingles, no intermediates */
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val mins = new Array[Long](NumHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      val base = Md5Prefix60.hash(arr.getUTF8String(i)) % P
      var j = 0
      while (j < NumHashes) {
        val v = (A(j) * base + B(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  def apply(c: Column): Column =
    graftshim.column(MinHashSig(graftshim.expression(c)))
}
