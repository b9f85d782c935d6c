package graft.queries

import org.apache.spark.sql.functions._

/** Top-principal-component projection over the embeddings table
  * ([[graft.ops.Pca]]) — oracle-checked END TO END: DuckDB recomputes
  * the fixed-point gram matrix, replays all four power-iteration steps
  * (list_sum = the same left fold, IEEE sqrt/divide correctly rounded),
  * and projects every vector, hash-matching the raw doubles.
  */
object PcaQuery {

  private val dim = 64
  private val iters = 4

  private def iterCtes(n: Int): String = (1 to n).map { k =>
    val prev = if (k == 1) "v0" else s"v${k - 1}"
    s"""w$k AS (SELECT [list_sum([g[i][j] * v[j]
                          for j in generate_series(1, $dim)])
                        for i in generate_series(1, $dim)] AS w
                FROM gmat, $prev),
        v$k AS (SELECT [x / sqrt(list_sum([y * y for y in w]))
                        for x in w] AS v FROM w$k)"""
  }.mkString(",\n")

  val pcaProject = Q(
    "q_pca_project",
    (s, dir) => {
      val e = tbl(s, dir, "embeddings")
        .filter(col("embedding").isNotNull) // defined null semantic: excluded
        .select(col("vec_id"),
          expr("transform(embedding, x -> cast(x as double))").as("v"))
      graft.ops.Pca.fitTop(e, "v", dim, iters) match {
        case Some(vec) =>
          graft.ops.Pca.project(e, "vec_id", "v", vec).orderBy("vec_id")
        case None => // empty corpus → typed empty result
          e.select(col("vec_id"), lit(0.0).as("pc1"))
      }
    },
    Some(s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
                        FROM embeddings WHERE embedding IS NOT NULL),
            cells AS (
              SELECT i, j,
                     CAST(floor(e.v[i + 1] * e.v[j + 1] * 1000000000)
                          AS BIGINT) AS fx
              FROM e, generate_series(0, ${dim - 1}) t1(i),
                      generate_series(0, ${dim - 1}) t2(j)),
            gram AS (SELECT i, j, sum(fx) AS s FROM cells GROUP BY i, j),
            gmat AS (SELECT list(rw ORDER BY i) AS g
                     FROM (SELECT i, list(CAST(s AS DOUBLE) / 1000000000
                                          ORDER BY j) AS rw
                           FROM gram GROUP BY i)),
            v0 AS (SELECT [0.125 for x in generate_series(1, $dim)] AS v),
            ${iterCtes(iters)}
            SELECT e.vec_id,
                   list_sum([e.v[j] * vf.v[j]
                             for j in generate_series(1, $dim)]) AS pc1
            FROM e, v$iters vf ORDER BY vec_id"""),
    bench = true)

  val all: Seq[Q] = Seq(pcaProject)
}
