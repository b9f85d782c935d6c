package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-quantized ANN over the embeddings table
  * ([[graft.ops.ProductQuantizer]]) — trained codebooks, map-side
  * encode/reconstruct, asymmetric top-k search. The DuckDB oracle
  * replays the ENTIRE chain: all m per-subspace L2 Lloyd trainings
  * (seed, both assignment rounds, both exact fixed-point recomputes),
  * the final encoding, the reconstruction concat + its norm, and the
  * ranked search — so a hash-match proves the trainer, the quantizer
  * and the search compose deterministically across engines, the same
  * guarantee `q_kmeans`/`q_knn_ivf_kmeans` give the coarse quantizer.
  */
object PqQuery {

  private[queries] val dim = 64
  private[queries] val m = 4 // subspaces
  private[queries] val ds = dim / m
  private[queries] val k = 8 // codes per subspace
  private[queries] val iters = 2
  private val nQueries = 8
  private val topK = 5

  private[queries] val duckCorpus =
    """SELECT vec_id, embedding::DOUBLE[] AS v,
              list_sum([x * x for x in embedding::DOUBLE[]]) AS nrm
       FROM embeddings WHERE embedding IS NOT NULL"""

  private[queries] def dot(a: String, b: String) =
    s"list_sum([$a[i] * $b[i] for i in generate_series(1, len($a))])"

  /** One oracle L2 assignment round of sub-frame `sub` against codebook
    * CTE `cin`, emitting (vec_id, sv, code) as CTE `aout`.
    */
  private[queries] def duckAssign(sub: String, cin: String, aout: String): String =
    s"""$aout AS (
         SELECT vec_id, sv, cid AS code FROM (
           SELECT t.vec_id, t.sv, c.cid,
                  ROW_NUMBER() OVER (PARTITION BY t.vec_id
                    ORDER BY ${dot("t.sv", "c.cv")} - c.cn / 2 DESC,
                             c.cid) AS arn
           FROM $sub t CROSS JOIN $cin c) WHERE arn = 1)"""

  /** Oracle recompute from assignment CTE `ain`: exact fixed-point
    * per-dimension means, new codebook as CTE `cout`.
    */
  private[queries] def duckRecompute(ain: String, cout: String): String =
    s"""${cout}_u AS (
         SELECT code, unnest(sv) AS val,
                unnest(generate_series(1, len(sv))) AS pos
         FROM $ain),
       ${cout}_m AS (
         SELECT code, pos,
                CAST(SUM(CAST(floor(val * 1e9) AS BIGINT)) AS DOUBLE)
                  / 1e9 / COUNT(*) AS mu
         FROM ${cout}_u GROUP BY code, pos),
       $cout AS (
         SELECT code AS cid, list(mu ORDER BY pos) AS cv,
                list_sum([x * x for x in list(mu ORDER BY pos)]) AS cn
         FROM ${cout}_m GROUP BY code)"""

  /** Full training + final-entry chain for subspace `s`: sub-vectors,
    * seed, `iters` (assign, recompute) rounds, then the final winning
    * ENTRY per vec_id (code + its centroid vector) as CTE `f<s>`.
    */
  private[queries] def duckSubspace(s: Int): String = {
    val sub = s"s$s"
    val lo = s * ds + 1
    val hi = (s + 1) * ds
    val seed = s"b${s}_0"
    val rounds = (1 to iters).map { i =>
      duckAssign(sub, s"b${s}_${i - 1}", s"a${s}_$i") + ",\n" +
        duckRecompute(s"a${s}_$i", s"b${s}_$i")
    }.mkString(",\n")
    s"""$sub AS (SELECT vec_id, v[$lo:$hi] AS sv FROM e),
        $seed AS (SELECT vec_id AS cid, sv AS cv,
                         list_sum([x * x for x in sv]) AS cn
                  FROM $sub WHERE vec_id < $k),
        $rounds,
        f$s AS (
          SELECT vec_id, cv FROM (
            SELECT t.vec_id, c.cv,
                   ROW_NUMBER() OVER (PARTITION BY t.vec_id
                     ORDER BY ${dot("t.sv", "c.cv")} - c.cn / 2 DESC,
                              c.cid) AS arn
            FROM $sub t CROSS JOIN b${s}_$iters c) WHERE arn = 1)"""
  }

  val knnPq = Q(
    "q_knn_pq",
    (s, dir) => {
      val e = tbl(s, dir, "embeddings")
        .filter(col("embedding").isNotNull) // defined null semantic: excluded
        .select(col("vec_id"),
          expr("transform(embedding, x -> cast(x as double))").as("v"))
        .withColumn("nrm", expr("dot_product(v, v)"))
      val books = graft.ops.ProductQuantizer.train(e, "v", dim, m, k, iters)
      if (books.isEmpty) {
        import org.apache.spark.sql.types._
        s.createDataFrame(
          s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(Seq(StructField("query_id", LongType),
            StructField("rnk", IntegerType),
            StructField("neighbor_id", LongType),
            StructField("approx_cos", DoubleType))))
      } else {
        val dec = graft.ops.ProductQuantizer.encodeDecode(e, "v", books)
          .select(col("vec_id"), col("dv"), col("dn"))
        val q = e.filter(col("vec_id") < nQueries)
          .select(col("vec_id").as("query_id"), col("v").as("qv"),
            col("nrm").as("qn"))
        val wTop = Window.partitionBy("query_id")
          .orderBy(col("approx_cos").desc, col("vec_id"))
        dec.join(broadcast(q), col("vec_id") =!= col("query_id"))
          .withColumn("approx_cos",
            expr("dot_product(qv, dv)") / sqrt(col("qn") * col("dn")))
          .withColumn("rnk", row_number().over(wTop))
          .filter(col("rnk") <= topK)
          .select(col("query_id"), col("rnk"),
            col("vec_id").as("neighbor_id"), col("approx_cos"))
          .orderBy("query_id", "rnk")
      }
    },
    Some(s"""WITH e AS ($duckCorpus),
            ${(0 until m).map(duckSubspace).mkString(",\n")},
            dec AS (
              SELECT e.vec_id,
                     ${(0 until m).map(s => s"f$s.cv").mkString(" || ")}
                       AS dv
              FROM e ${(0 until m).map(s =>
                s"JOIN f$s ON e.vec_id = f$s.vec_id").mkString(" ")}),
            dn AS (SELECT vec_id, dv,
                          list_sum([x * x for x in dv]) AS dn FROM dec),
            q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn
                  FROM e WHERE vec_id < $nQueries),
            scored AS (
              SELECT q.query_id, d.vec_id AS neighbor_id,
                     ${dot("q.qv", "d.dv")} / sqrt(q.qn * d.dn)
                       AS approx_cos
              FROM q CROSS JOIN dn d WHERE d.vec_id != q.query_id),
            ranked AS (
              SELECT query_id, neighbor_id, approx_cos,
                     CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY approx_cos DESC, neighbor_id) AS INT)
                       AS rnk
              FROM scored)
            SELECT query_id, rnk, neighbor_id, approx_cos
            FROM ranked WHERE rnk <= $topK
            ORDER BY query_id, rnk"""),
    bench = true)

  val all: Seq[Q] = Seq(knnPq)
}
