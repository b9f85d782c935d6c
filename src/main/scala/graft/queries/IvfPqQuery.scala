package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import CurationQueries.{duckAssign, duckCorpus, duckDot, duckRecompute, kmK, kmIters}
import PqQuery.duckSubspace

/** IVF-PQ — the two trained quantizers COMPOSED, the shape
  * billion-vector serving indexes actually use: the coarse k-means
  * quantizer prunes the search to `nprobe` buckets (I/O), the per-row
  * product codes replace stored vectors (memory: m ints vs d doubles),
  * and scoring runs asymmetric — exact query vectors against
  * reconstructions — inside the probed buckets only.
  *
  * The DuckDB oracle replays BOTH trainings (the two-iteration Lloyd
  * coarse quantizer of `q_kmeans` AND all four per-subspace PQ
  * codebook trainings of `q_knn_pq`), the bucket assignment, the
  * encoding + reconstruction, the probe selection and the in-bucket
  * ranked search — one hash-match proving the full index pipeline
  * (train → quantize → prune → score) is deterministic cross-engine.
  *
  * Scale shape: both trainers are bounded-model corpus scans; encode +
  * bucket are map-only; the probe frame (queries × nprobe) broadcasts;
  * only in-bucket candidates reach the per-query top-k. With the
  * materialized store ([[graft.ops.ProductQuantizer.buildStore]],
  * spec-proven equal answers + partition pruning) the scan reads
  * ~nprobe/nlist of an index that is itself ~128× smaller than
  * IVF-Flat.
  */
object IvfPqQuery {

  private val nQueries = 8
  private[queries] val nProbe = 2
  private val topK = 5

  val knnIvfPq = Q(
    "q_knn_ivfpq",
    (s, dir) => {
      val e = tbl(s, dir, "embeddings")
        .filter(col("embedding").isNotNull) // defined null semantic: excluded
        .select(col("vec_id"),
          expr("transform(embedding, x -> cast(x as double))").as("v"))
        .withColumn("nrm", expr("dot_product(v, v)"))
      val cents = graft.ops.KMeans.lloyd(e, kmK, kmIters)
      val books = graft.ops.ProductQuantizer.train(
        e, "v", PqQuery.dim, PqQuery.m, PqQuery.k, PqQuery.iters)
      if (cents.isEmpty || books.isEmpty) {
        import org.apache.spark.sql.types._
        s.createDataFrame(
          s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(Seq(StructField("query_id", LongType),
            StructField("rnk", IntegerType),
            StructField("neighbor_id", LongType),
            StructField("approx_cos", DoubleType))))
      } else {
        val enc = graft.ops.ProductQuantizer.encodeDecode(e, "v", books)
          .withColumn("bucket",
            graft.ops.VectorIndex.assignBucket(cents))
          .select(col("vec_id"), col("bucket"), col("dv"), col("dn"))
        def cosTo(c: graft.ops.VectorIndex.Centroid) =
          call_function("dot_product", col("v"), typedLit(c.v)) /
            sqrt(lit(c.nrm) * col("nrm"))
        val terms = cents.map(c =>
          struct(cosTo(c).as("c"), lit(-c.id).as("nc")))
        val probes = e.filter(col("vec_id") < nQueries)
          .select(col("vec_id").as("query_id"), col("v").as("qv"),
            col("nrm").as("qn"),
            explode(slice(sort_array(array(terms: _*), asc = false),
              1, nProbe)).as("p"))
          .select(col("query_id"), col("qv"), col("qn"),
            (-col("p.nc")).cast("int").as("bucket"))
        val wTop = Window.partitionBy("query_id")
          .orderBy(col("approx_cos").desc, col("vec_id"))
        enc.join(broadcast(probes), "bucket")
          .filter(col("vec_id") =!= col("query_id"))
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
            c0 AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM e
                   WHERE vec_id < $kmK),
            ${duckAssign("c0", "a1")},
            ${duckRecompute("a1", "c1")},
            ${duckAssign("c1", "a2")},
            ${duckRecompute("a2", "c2")},
            ${duckAssign("c2", "af")},
            ${(0 until PqQuery.m).map(duckSubspace).mkString(",\n")},
            dec AS (
              SELECT e.vec_id,
                     ${(0 until PqQuery.m).map(s => s"f$s.cv")
                       .mkString(" || ")} AS dv
              FROM e ${(0 until PqQuery.m).map(s =>
                s"JOIN f$s ON e.vec_id = f$s.vec_id").mkString(" ")}),
            dn AS (SELECT vec_id, dv,
                          list_sum([x * x for x in dv]) AS dn FROM dec),
            q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM e
                  WHERE vec_id < $nQueries),
            pr AS (
              SELECT query_id, qv, qn, cid AS bucket FROM (
                SELECT q.query_id, q.qv, q.qn, c.cid,
                       ROW_NUMBER() OVER (PARTITION BY q.query_id
                         ORDER BY ${duckDot("q.qv", "c.cv")}
                                    / sqrt(q.qn * c.cn) DESC, c.cid) AS prn
                FROM q CROSS JOIN c2 c) WHERE prn <= $nProbe),
            scored AS (
              SELECT pr.query_id, a.vec_id,
                     ${duckDot("pr.qv", "d.dv")} / sqrt(pr.qn * d.dn)
                       AS approx_cos
              FROM pr JOIN af a
                ON a.bucket = pr.bucket AND a.vec_id <> pr.query_id
              JOIN dn d ON d.vec_id = a.vec_id),
            ranked AS (
              SELECT query_id, vec_id, approx_cos,
                     CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY approx_cos DESC, vec_id) AS INT) AS rnk
              FROM scored)
            SELECT query_id, rnk, vec_id AS neighbor_id, approx_cos
            FROM ranked WHERE rnk <= $topK
            ORDER BY query_id, rnk"""),
    bench = true)

  val all: Seq[Q] = Seq(knnIvfPq)
}
