package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Top-principal-component extraction over an embedding column — the
  * standard preprocessing step before embedding-space dedup/ANN (center
  * of SemDeDup-style pipelines: project out or inspect the dominant
  * direction), computed so a second engine can replay it BIT-EXACTLY:
  *
  *   - The d×d gram matrix is aggregated in FIXED-POINT: each cell
  *     contribution is floor(x_i·x_j·1e9) as a long (IEEE product and
  *     power-of-ten scale are deterministic, floor is exact, long sums
  *     are order-free), so the shuffle is commutative integer addition —
  *     no double-summation order dependence anywhere.
  *   - Power iteration runs DRIVER-SIDE on the collected 64×64 matrix
  *     (bounded model state, same pattern as the k-means centroids) with
  *     a fixed start vector (1/√d = 0.125, exactly representable), a
  *     fixed iteration count, and left-to-right fold order — the exact
  *     arithmetic a DuckDB `list_sum` comprehension performs, so the
  *     oracle replays training step for step. IEEE sqrt and division are
  *     correctly rounded, hence identical cross-engine.
  *   - Projection is map-side: `dot_product(vec, lit(v))` with the same
  *     left fold.
  *
  * Scale: the gram explode emits d² cells per row, but map-side combine
  * collapses every partition to ≤ d² groups before the (tiny) shuffle;
  * the model fetch is d² longs. The 1e9 scale bounds the corpus at
  * ~9×10⁹ rows before long overflow — past that, widen to DECIMAL sums
  * or drop the scale a decade (the survey-scale caveat, documented, not
  * silent).
  */
object Pca {

  val Scale = 1000000000L // 1e9 fixed-point grid

  /** Gram-matrix cells (i, j, s) as fixed-point long sums — the exploded
    * reference formulation; [[fitTop]] uses the native `gram_agg` kernel,
    * and `PcaSpec` pins their bit-equivalence.
    */
  def gramCells(e: DataFrame, vecCol: String, d: Int): DataFrame =
    e.filter(col(vecCol).isNotNull)
      .select(explode(expr(
        s"""flatten(transform($vecCol, (xi, i) -> transform($vecCol,
            (xj, j) -> named_struct('i', i, 'j', j,
              'fx', CAST(floor(xi * xj * 1e9) AS BIGINT)))))""")).as("c"))
      .select(col("c.i"), col("c.j"), col("c.fx"))
      .groupBy("i", "j").agg(sum("fx").as("s"))

  /** Top principal direction after `iters` power-iteration steps from
    * the uniform start vector; None when the input has no vectors.
    * The gram pass is the native [[graft.functions.GramAgg]] aggregate:
    * one tight array loop per row, one d²-long buffer per partition
    * through the exchange — no per-row cell materialization.
    */
  def fitTop(e: DataFrame, vecCol: String, d: Int, iters: Int): Option[Array[Double]] = {
    graft.functions.GraftFunctions.ensureRegistered(e.sparkSession)
    val row = e
      .agg(expr(s"gram_agg($vecCol, $d)").as("g"),
        count(col(vecCol)).as("n"))
      .head()
    if (row.getLong(1) == 0L) return None
    val flat = row.getSeq[Long](0)
    val g = Array.ofDim[Double](d, d)
    var ci = 0
    while (ci < d) {
      var cj = 0
      while (cj < d) {
        g(ci)(cj) = flat(ci * d + cj).toDouble / Scale
        cj += 1
      }
      ci += 1
    }
    var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    var it = 0
    while (it < iters) {
      val w = Array.tabulate(d) { i =>
        var s = 0.0; var j = 0
        while (j < d) { s += g(i)(j) * v(j); j += 1 }
        s
      }
      var n2 = 0.0
      var i = 0
      while (i < d) { n2 += w(i) * w(i); i += 1 }
      val nrm = math.sqrt(n2)
      v = w.map(_ / nrm)
      it += 1
    }
    Some(v)
  }

  /** Map-side projection of every vector onto `v` (left-fold dot). */
  def project(e: DataFrame, idCol: String, vecCol: String,
      v: Array[Double]): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(e.sparkSession)
    // each component CAST to DOUBLE: a bare decimal literal would parse
    // as DecimalType and fail dot_product's type check (Double.toString
    // round-trips exactly, so the cast is lossless)
    val lits = v.map(x => s"CAST('$x' AS DOUBLE)").mkString(", ")
    e.filter(col(vecCol).isNotNull)
      .select(col(idCol),
        expr(s"dot_product($vecCol, array($lits))").as("pc1"))
  }
}
