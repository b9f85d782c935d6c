package graft.queries

import org.apache.spark.sql.functions._

/** Per-vector absmax int8 quantization of the embedding corpus — the
  * scalar-quantization serving leg beside PQ (`q_knn_pq`): store 1 byte
  * per dimension + one scale instead of a float, an 4–8× resident-index
  * shrink that (unlike PQ) needs no training pass. Map-only: every
  * vector is quantized independently (code_i = ⌊127·x_i/absmax + ½⌋,
  * zero vectors guarded to all-zero codes), so the op is embarrassingly
  * parallel at any scale. The query emits per-vector integrity numbers —
  * exact integer code checksums and the max absolute reconstruction
  * error — and the oracle recomputes the whole quantize→reconstruct
  * chain element-for-element with the same IEEE formula text, so a hash
  * match proves the codes (not just the stats) agree.
  */
object QuantizeQuery {

  val quantizeInt8 = Q(
    "q_quantize_int8",
    (s, dir) => tbl(s, dir, "embeddings")
      .filter(col("embedding").isNotNull) // defined null semantic: excluded
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
      .withColumn("m", expr("array_max(transform(v, x -> abs(x)))"))
      .withColumn("codes", expr(
        "transform(v, x -> if(m = 0.0D, 0L," +
          " cast(floor(127.0D * x / m + 0.5D) as bigint)))"))
      .select(col("vec_id"),
        size(col("v")).cast("long").as("n_dims"),
        round(col("m"), 9).as("scale"),
        expr("aggregate(codes, 0L, (a, c) -> a + c)").as("code_sum"),
        expr("aggregate(codes, 0L, (a, c) -> a + abs(c))")
          .as("code_abs_sum"),
        round(expr(
          "array_max(zip_with(v, codes," +
            " (x, c) -> abs(x - cast(c as double) * m / 127.0D)))"), 9)
          .as("max_err"))
      .orderBy("vec_id"),
    Some("""WITH e AS (
              SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
              WHERE embedding IS NOT NULL),
            q AS (
              SELECT vec_id, v, list_max([abs(x) for x in v]) AS m
              FROM e),
            c AS (
              SELECT vec_id, v, m,
                     [CASE WHEN m = 0 THEN 0
                           ELSE CAST(floor(127.0 * x / m + 0.5) AS BIGINT)
                      END for x in v] AS codes
              FROM q)
            SELECT vec_id, CAST(len(v) AS BIGINT) AS n_dims,
                   ROUND(m, 9) AS scale,
                   CAST(list_sum(codes) AS BIGINT) AS code_sum,
                   CAST(list_sum([abs(x) for x in codes]) AS BIGINT)
                     AS code_abs_sum,
                   ROUND(list_max([abs(v[i] - CAST(codes[i] AS DOUBLE)
                       * m / 127.0)
                     for i in generate_series(1, len(v))]), 9) AS max_err
            FROM c ORDER BY vec_id"""))

  private val nQueries = 8
  // Serve the SAME k as the brute-force ground truth (top-10): the
  // q_ann_recall int8 leg is then directly rankable against IVF at equal
  // k (a 5-deep probe against 10-deep truth capped recall at 0.5 by
  // construction and made the one index-decision table k-incomparable).
  private val topK = 10

  /** Shared oracle chain: corpus → absmax scale → int8 codes →
    * reconstruction + its norm, as CTEs (e, q8, c8, dec8).
    */
  private[queries] val duckInt8Chain =
    """e AS (
         SELECT vec_id, embedding::DOUBLE[] AS v,
                list_sum([x * x for x in embedding::DOUBLE[]]) AS nrm
         FROM embeddings WHERE embedding IS NOT NULL),
       q8 AS (
         SELECT vec_id, v, nrm, list_max([abs(x) for x in v]) AS m
         FROM e),
       c8 AS (
         SELECT vec_id, v, nrm, m,
                [CASE WHEN m = 0 THEN 0
                      ELSE CAST(floor(127.0 * x / m + 0.5) AS BIGINT)
                 END for x in v] AS codes
         FROM q8),
       dec8 AS (
         SELECT vec_id,
                [CAST(codes[i] AS DOUBLE) * m / 127.0
                 for i in generate_series(1, len(codes))] AS dv
         FROM c8),
       dn8 AS (
         SELECT vec_id, dv, list_sum([x * x for x in dv]) AS dn
         FROM dec8)"""

  /** ANN over the int8-RECONSTRUCTED corpus — the serving query the
    * quantized index answers: exact query vectors scored against
    * dequantized corpus vectors (asymmetric, like `q_knn_pq`), top-k per
    * query. Map-only reconstruct (no training, no shuffle before the
    * per-query top-k), broadcast query batch. With `q_ann_recall`'s
    * `int8` leg this yields the recall-vs-shrink tradeoff line the
    * serving decision needs: int8 (4–8×, no training) vs PQ (128×,
    * trained).
    */
  val knnInt8 = Q(
    "q_knn_int8",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = tbl(s, dir, "embeddings")
        .filter(col("embedding").isNotNull)
        .select(col("vec_id"),
          expr("transform(embedding, x -> cast(x as double))").as("v"))
        .withColumn("nrm", expr("dot_product(v, v)"))
      val dec = e
        .withColumn("m", expr("array_max(transform(v, x -> abs(x)))"))
        .withColumn("dv", expr(
          "transform(v, x -> if(m = 0.0D, 0.0D," +
            " cast(cast(floor(127.0D * x / m + 0.5D) as bigint) as double)" +
            " * m / 127.0D))"))
        .select(col("vec_id"), col("dv"),
          expr("dot_product(dv, dv)").as("dn"))
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
    },
    Some(s"""WITH $duckInt8Chain,
            q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM e
                  WHERE vec_id < $nQueries),
            scored AS (
              SELECT q.query_id, d.vec_id AS neighbor_id,
                     list_sum([q.qv[i] * d.dv[i]
                       for i in generate_series(1, len(q.qv))])
                       / sqrt(q.qn * d.dn) AS approx_cos
              FROM q CROSS JOIN dn8 d WHERE d.vec_id != q.query_id),
            ranked AS (
              SELECT query_id, neighbor_id, approx_cos,
                     CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY approx_cos DESC, neighbor_id) AS INT)
                       AS rnk
              FROM scored)
            SELECT query_id, rnk, neighbor_id, approx_cos
            FROM ranked WHERE rnk <= $topK
            ORDER BY query_id, rnk"""),
    // benched since r7 so the ANN decision table (q_ann_cost + COVERAGE)
    // carries a measured latency for every index leg, not four of five
    bench = true)

  val all: Seq[Q] = Seq(quantizeInt8, knnInt8)
}
