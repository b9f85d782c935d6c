package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import VectorIndex.Centroid

/** Product quantization for embedding columns — the memory-bounded ANN
  * leg next to IVF ([[VectorIndex]]) and sign-LSH: the vector is split
  * into `m` contiguous subspaces, each subspace gets its own small
  * codebook (trained by L2 Lloyd on the sub-vectors), and a stored row
  * is just `m` small code integers instead of `d` doubles — 128× less
  * index state at (d=64, m=4, k=8), which is what lets a 100 TB corpus's
  * index live in executor memory or a compact store. Search is the
  * standard asymmetric scheme: the QUERY keeps its exact vector, the
  * corpus side is reconstructed from codebook entries (m array lookups
  * per row, map-side), and the cosine uses the reconstruction's own
  * norm.
  *
  * Scale shape: training is `m × iters` bounded-model corpus scans
  * (codebooks are driver-side literals, exactly like the IVF centroids —
  * never a data collect); encoding and reconstruction are map-only
  * projections; scoring broadcasts the query batch. Nothing shuffles the
  * corpus until the final per-query top-k.
  *
  * Cross-engine determinism (so a DuckDB oracle can replay TRAINING +
  * encoding + search end-to-end): sub-assignment is an argmax of
  * `dot(sv, c) − ‖c‖²/2` (the L2 argmin, rewritten so the row term ‖sv‖²
  * cancels) with lowest-code tie-break; centroid recomputes use the same
  * exact fixed-point `floor(x·1e9)` integer sums as [[KMeans]]; the
  * reconstruction is pure concatenation, so its norm is the same
  * left-fold sum-of-squares both engines compute. Every floating op left
  * (dot folds, sqrt, divide) is IEEE-correctly-rounded and
  * order-pinned.
  */
object ProductQuantizer {

  /** One subspace's codebook: `sub` = subspace index, centroids carry
    * (code id, sub-vector, ‖c‖²).
    */
  final case class Codebook(sub: Int, ds: Int, cents: Seq[Centroid])

  /** slice of `vcol` for subspace `sub` (ds components, 0-based start). */
  def subVec(vcol: String, sub: Int, ds: Int): Column =
    expr(s"slice($vcol, ${sub * ds + 1}, $ds)")

  /** struct(score = dot − ‖c‖²/2, nc = −code, cv, cn) of the L2-nearest
    * codebook entry — argmax with lowest-code tie-break, map-only. The
    * winning entry's vector rides along so callers reconstruct without a
    * code→row lookup.
    */
  def bestEntry(cents: Seq[Centroid], svCol: Column): Column =
    array_max(array(cents.map(c => struct(
      (call_function("dot_product", svCol, typedLit(c.v))
        - lit(c.nrm / 2.0)).as("c"),
      lit(-c.id).as("nc"),
      typedLit(c.v).as("cv"),
      lit(c.nrm).as("cn"))): _*))

  /** Train all `m` codebooks: per subspace, seed from the k lowest
    * vec_ids' sub-vectors, refine with `iters` L2 Lloyd steps. Empty
    * corpus → empty result.
    *
    * All subspaces train TOGETHER: each iteration is ONE corpus scan
    * that assigns every subspace map-side and aggregates the exact
    * fixed-point partial sums keyed by (sub, code, pos) — m× fewer jobs
    * than training subspaces one at a time, with bit-identical sums
    * (the per-element arithmetic and grouping are unchanged, the groups
    * merely share a shuffle).
    */
  def train(e: DataFrame, vecCol: String, d: Int, m: Int, k: Int,
      iters: Int): Seq[Codebook] = {
    graft.functions.GraftFunctions.ensureRegistered(e.sparkSession)
    val ds = d / m
    val nn = e.filter(col(vecCol).isNotNull)
    // one bounded model-state fetch seeds every subspace
    val seedRows = nn.filter(col("vec_id") < k)
      .select(col("vec_id"), col(vecCol)).collect().sortBy(_.getLong(0))
    if (seedRows.isEmpty) return Seq.empty
    var books: Seq[Seq[Centroid]] = (0 until m).map { s =>
      seedRows.map { r =>
        val v = r.getSeq[Double](1).slice(s * ds, (s + 1) * ds)
        Centroid(r.getLong(0), v, v.foldLeft(0.0)((a, x) => a + x * x))
      }.toSeq
    }
    var i = 0
    while (i < iters) {
      val terms = (0 until m).map { s =>
        struct(lit(s).as("sub"),
          (-bestEntry(books(s), subVec(vecCol, s, ds)).getField("nc"))
            .cast("int").as("code"),
          subVec(vecCol, s, ds).as("sv"))
      }
      val rows = nn.select(explode(array(terms: _*)).as("t"))
        .select(col("t.sub"), col("t.code"), posexplode(col("t.sv")))
        .groupBy("sub", "code", "pos")
        .agg(sum(floor(col("col") * lit(1e9)).cast(DecimalType(38, 0)))
          .as("s"), count(lit(1)).as("n"))
        .collect()
      books = (0 until m).map { s =>
        rows.filter(_.getInt(0) == s).groupBy(_.getInt(1))
          .map { case (code, dims) =>
            val comps = dims.sortBy(_.getInt(2)).map { r =>
              r.getDecimal(3).doubleValue() / 1.0e9 / r.getLong(4)
            }.toSeq
            // left-to-right fold, matching list_sum([x*x ...]) on the oracle
            Centroid(code.toLong, comps,
              comps.foldLeft(0.0)((a, x) => a + x * x))
          }.toSeq.sortBy(_.id)
      }
      i += 1
    }
    (0 until m).map(s => Codebook(s, ds, books(s)))
  }

  /** Map-only encode + reconstruct: adds `codes` (array of m ints — the
    * stored representation), `dv` (the reconstruction — concatenated
    * winning sub-centroids) and `dn` (its left-fold squared norm).
    */
  def encodeDecode(e: DataFrame, vecCol: String,
      books: Seq[Codebook]): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(e.sparkSession)
    val best = books.map(b =>
      bestEntry(b.cents, subVec(vecCol, b.sub, b.ds)))
    e.filter(col(vecCol).isNotNull)
      .withColumn("codes",
        array(best.map(b => (-b.getField("nc")).cast("int")): _*))
      .withColumn("dv", flatten(array(best.map(_.getField("cv")): _*)))
      .withColumn("dn", expr("dot_product(dv, dv)"))
  }
}
