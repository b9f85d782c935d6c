package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

/** Maximal Marginal Relevance selection over a bounded candidate set —
  * the diversity re-rank stage of a retrieval stack: greedily pick k
  * items maximizing `λ·rel(d) − (1−λ)·max_{s∈S} cos(d, s)` (relevance
  * traded against redundancy with what is already selected).
  *
  * MMR is inherently sequential in k, so it does NOT belong in a
  * distributed aggregate: candidates are already a bounded top-N per
  * query (the ANN/BM25 leg's output), and this kernel runs the O(N·k)
  * greedy loop map-side per query row — the selection never shuffles.
  *
  * Determinism contract: cosines fold left-to-right like `dot_product`
  * (= DuckDB's list_sum comprehension), maxSim over the selected set is
  * an order-free max with 0.0 for the empty set, the pick compares
  * (score, −id) lexicographically — exactly the `MAX(struct_pack(score,
  * nid := −id, …))` the oracle's recursive CTE replays, so the full
  * selection sequence is bit-reproducible cross-engine.
  *
  * Input: `array<struct<id bigint, v array<double>, rel double>>`;
  * output: `array<struct<id bigint, score double>>` in selection order.
  */
case class MmrSelect(child: Expression, lam: Double, k: Int)
    extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "mmr_select"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StructType(Array(
        StructField(_, LongType, _, _),
        StructField(_, ArrayType(DoubleType, _), _, _),
        StructField(_, DoubleType, _, _))), _) =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        "mmr_select expects array<struct<id bigint, v array<double>, " +
          s"rel double>>, got ${t.sql}")
    }

  override protected def nullSafeEval(a: Any): Any =
    MmrSelect.compute(a.asInstanceOf[ArrayData], lam, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val compute = "graft.functions.MmrSelect.compute"
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $compute($a, $lam, $k);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): MmrSelect = copy(child = newChild)
}

object MmrSelect {

  def compute(cands: ArrayData, lam: Double, k: Int): ArrayData = {
    val n = cands.numElements()
    val ids = new Array[Long](n)
    val vecs = new Array[Array[Double]](n)
    val norms = new Array[Double](n)
    val rels = new Array[Double](n)
    var i = 0
    while (i < n) {
      val row = cands.getStruct(i, 3)
      ids(i) = row.getLong(0)
      val va = row.getArray(1)
      val v = new Array[Double](va.numElements())
      var j = 0
      while (j < v.length) { v(j) = va.getDouble(j); j += 1 }
      vecs(i) = v
      // self-norm: left-to-right fold, the dot_product/list_sum order
      var nrm = 0.0
      j = 0
      while (j < v.length) { nrm += v(j) * v(j); j += 1 }
      norms(i) = nrm
      rels(i) = row.getDouble(2)
      i += 1
    }
    val taken = new Array[Boolean](n)
    val out = new java.util.ArrayList[Any](math.min(k, n))
    val selected = new java.util.ArrayList[Int]()
    var picks = 0
    while (picks < k && picks < n) {
      var best = -1
      var bestScore = 0.0
      i = 0
      while (i < n) {
        if (!taken(i)) {
          // max cosine to the selected set; 0.0 when nothing selected
          var ms = 0.0
          var first = true
          var s = 0
          while (s < selected.size()) {
            val sj = selected.get(s)
            val a = vecs(i); val bv = vecs(sj)
            var dot = 0.0
            var j = 0
            while (j < a.length && j < bv.length) {
              dot += a(j) * bv(j); j += 1
            }
            val cos = dot / math.sqrt(norms(i) * norms(sj))
            if (first || cos > ms) { ms = cos; first = false }
            s += 1
          }
          if (first) ms = 0.0
          val score = lam * rels(i) - (1.0 - lam) * ms
          // lexicographic (score, -id): higher score, then lower id
          if (best == -1 || score > bestScore ||
              (score == bestScore && ids(i) < ids(best))) {
            best = i; bestScore = score
          }
        }
        i += 1
      }
      taken(best) = true
      selected.add(best)
      out.add(InternalRow(ids(best), bestScore))
      picks += 1
    }
    new GenericArrayData(out.toArray)
  }
}
