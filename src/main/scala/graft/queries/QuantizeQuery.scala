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

  val all: Seq[Q] = Seq(quantizeInt8)
}
