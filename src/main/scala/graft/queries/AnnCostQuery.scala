package graft.queries

import org.apache.spark.sql.functions._

import CurationQueries.{duckAssign, duckRecompute, kmK, kmIters}

/** The ANN index DECISION TABLE — one oracle-checked frame joining the
  * three axes every 100 TB serving decision trades between, per index
  * type: memory (modeled resident bytes per vector), probe cost
  * (candidate rows scored per query sweep, and the fraction of the
  * exhaustive sweep that represents), and quality (micro recall@k
  * against the brute-force truth). Before this query those numbers
  * lived in three places (NOTES compression claims, `q_ann_recall`,
  * BENCH timings); here they are one table, and the latency axis joins
  * in from BENCH_LOCAL via COVERAGE.md (latency is wall-clock, so it
  * cannot be oracle-checked).
  *
  * Modeled bytes per vector (d=64 doubles, m=4 PQ codes — stated, not
  * measured, so the column is deterministic and engine-independent):
  *   - brute / ivf-flat: 8 (vec_id) + 64×8 (vector) + 8 (norm) = 528
  *     (+4 bucket for ivf = 532);
  *   - int8: 8 + 64×1 (codes) + 8 (absmax scale) = 80;
  *   - pq: 8 + 4×1 (code bytes) = 12 (+4 bucket for ivfpq = 16).
  *
  * Probe cost replays each index's candidate generation EXACTLY (same
  * assignment/probe fragments as the serving queries) and counts the
  * (query, candidate) pairs scored: brute/int8/pq sweep the corpus
  * (scan_frac 1.0 — PQ saves memory, not candidates), ivf/ivfpq score
  * only their probed buckets. Recall legs reuse the serving queries
  * verbatim — IVF/int8 at k=10, the PQ legs at their deliberate
  * 5-deep-serving-vs-10-truth operating point (recorded as k_served).
  *
  * Scale shape: counts are map-side-combining aggregates over the same
  * broadcast-probe joins the serving queries use; nothing new shuffles.
  */
object AnnCostQuery {

  private val nQueries = SimilarityQueries.nQueries

  private def corpus(s: org.apache.spark.sql.SparkSession, dir: String) =
    tbl(s, dir, "embeddings")
      .filter(col("embedding").isNotNull) // defined null semantic: excluded
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
      .withColumn("nrm", expr("dot_product(v, v)"))

  private val duckCorpus =
    """SELECT vec_id, embedding::DOUBLE[] AS v,
              list_sum([x * x for x in embedding::DOUBLE[]]) AS nrm
       FROM embeddings WHERE embedding IS NOT NULL"""

  private def emptyCost(s: org.apache.spark.sql.SparkSession) = {
    import org.apache.spark.sql.types._
    s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("idx", StringType),
        StructField("n_rows", LongType),
        StructField("bytes_per_vec", LongType),
        StructField("mb_resident", DoubleType),
        StructField("k_served", LongType),
        StructField("cand_rows", LongType),
        StructField("scan_frac", DoubleType),
        StructField("recall", DoubleType))))
  }

  val annCost = Q(
    "q_ann_cost",
    (s, dir) => {
      val e = corpus(s, dir)
      val cents32 = graft.ops.VectorIndex.centroidsFrom(
        e, SimilarityQueries.nCentroids)
      val centsK = graft.ops.KMeans.lloyd(e, kmK, kmIters)
      if (cents32.isEmpty || centsK.isEmpty) emptyCost(s) else {
        val q = e.filter(col("vec_id") < nQueries)
          .select(col("vec_id").as("query_id"), col("v").as("qv"),
            col("nrm").as("qn"))
        val nRows = e.agg(count(lit(1)).cast("long").as("n_rows"))

        // candidate counts — same assignment/probe rules as the legs
        def candCount(cand: org.apache.spark.sql.DataFrame, as: String) =
          cand.agg(count(lit(1)).cast("long").as(as))
        val fullCand = candCount(
          e.crossJoin(broadcast(q))
            .filter(col("vec_id") =!= col("query_id")), "full_cand")
        def bucketCand(cents: Seq[graft.ops.VectorIndex.Centroid],
            nProbe: Int, as: String) =
          candCount(
            e.withColumn("bucket", graft.ops.VectorIndex.assignBucket(cents))
              .join(broadcast(
                graft.ops.ProductQuantizer.probesOf(q, cents, nProbe)
                  .select(col("query_id"), col("bucket"))), "bucket")
              .filter(col("vec_id") =!= col("query_id")), as)
        val ivfCand = bucketCand(cents32, SimilarityQueries.nProbe, "c")
        val ivfpqCand = bucketCand(centsK, IvfPqQuery.nProbe, "c")

        // recall: serving legs verbatim vs brute truth, micro-aggregated
        val brute = SimilarityQueries.knnBrute.spark(s, dir)
          .select(col("query_id"), col("neighbor_id"))
        val truth = brute.agg(count(lit(1)).cast("long").as("t"))
        def hitsOf(leg: org.apache.spark.sql.DataFrame) =
          leg.select(col("query_id"), col("neighbor_id"))
            .join(brute, Seq("query_id", "neighbor_id"))
            .agg(count(lit(1)).cast("long").as("h"))

        def row(idx: String, bytes: Long, kServed: Long,
            cand: org.apache.spark.sql.DataFrame,
            hits: org.apache.spark.sql.DataFrame) =
          nRows.crossJoin(fullCand)
            .crossJoin(cand.toDF("cand_rows")).crossJoin(hits)
            .crossJoin(truth)
            .select(lit(idx).as("idx"), col("n_rows"),
              lit(bytes).as("bytes_per_vec"),
              round((col("n_rows") * lit(bytes)).cast("double") / lit(1e6),
                3).as("mb_resident"),
              lit(kServed).as("k_served"), col("cand_rows"),
              round(col("cand_rows").cast("double")
                / col("full_cand").cast("double"), 6).as("scan_frac"),
              round(col("h").cast("double") / col("t").cast("double"), 6)
                .as("recall"))

        // brute IS the truth — its hit count is the truth count (a literal
        // self-join would trip Spark's ambiguous-self-join analysis)
        row("brute", 528L, 10L, fullCand.toDF("c"), truth.toDF("h"))
          .unionByName(row("int8", 80L, 10L, fullCand.toDF("c"),
            hitsOf(QuantizeQuery.knnInt8.spark(s, dir))))
          .unionByName(row("ivf", 532L, 10L, ivfCand,
            hitsOf(SimilarityQueries.knnIvf.spark(s, dir))))
          .unionByName(row("ivfpq", 16L, 5L, ivfpqCand,
            hitsOf(IvfPqQuery.knnIvfPq.spark(s, dir))))
          .unionByName(row("pq", 12L, 5L, fullCand.toDF("c"),
            hitsOf(PqQuery.knnPq.spark(s, dir))))
          .orderBy("idx")
      }
    },
    Some(s"""WITH e AS ($duckCorpus),
            q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM e
                  WHERE vec_id < $nQueries),
            nr AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows FROM e),
            fc AS (SELECT CAST(COUNT(*) AS BIGINT) AS full_cand
                   FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id),
            cent AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM e
                     WHERE vec_id < ${SimilarityQueries.nCentroids}),
            iassigned AS (
              SELECT vec_id, cid AS bucket FROM (
                SELECT e.vec_id, cent.cid,
                       ROW_NUMBER() OVER (PARTITION BY e.vec_id
                         ORDER BY ${CurationQueries.duckDot("e.v", "cent.cv")}
                                    / sqrt(e.nrm * cent.cn) DESC,
                                  cent.cid) AS arn
                FROM e CROSS JOIN cent) WHERE arn = 1),
            iprobes AS (
              SELECT query_id, cid AS bucket FROM (
                SELECT q.query_id, cent.cid,
                       ROW_NUMBER() OVER (PARTITION BY q.query_id
                         ORDER BY ${CurationQueries.duckDot("q.qv", "cent.cv")}
                                    / sqrt(q.qn * cent.cn) DESC,
                                  cent.cid) AS prn
                FROM q CROSS JOIN cent)
              WHERE prn <= ${SimilarityQueries.nProbe}),
            ic AS (SELECT CAST(COUNT(*) AS BIGINT) AS c
                   FROM iassigned a JOIN iprobes p ON a.bucket = p.bucket
                   WHERE a.vec_id <> p.query_id),
            c0 AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM e
                   WHERE vec_id < $kmK),
            ${(1 to kmIters).map(i =>
              duckAssign(s"c${i - 1}", s"ka$i") + ",\n" +
                duckRecompute(s"ka$i", s"c$i")).mkString(",\n")},
            ${duckAssign(s"c$kmIters", "kaf")},
            kprobes AS (
              SELECT query_id, cid AS bucket FROM (
                SELECT q.query_id, c.cid,
                       ROW_NUMBER() OVER (PARTITION BY q.query_id
                         ORDER BY ${CurationQueries.duckDot("q.qv", "c.cv")}
                                    / sqrt(q.qn * c.cn) DESC, c.cid) AS prn
                FROM q CROSS JOIN c$kmIters c)
              WHERE prn <= ${IvfPqQuery.nProbe}),
            ipc AS (SELECT CAST(COUNT(*) AS BIGINT) AS c
                    FROM kaf a JOIN kprobes p ON a.bucket = p.bucket
                    WHERE a.vec_id <> p.query_id),
            brute AS (${SimilarityQueries.knnBrute.oracle.get}),
            t AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM brute),
            ivf AS (${SimilarityQueries.knnIvf.oracle.get}),
            pq AS (${PqQuery.knnPq.oracle.get}),
            ivfpq AS (${IvfPqQuery.knnIvfPq.oracle.get}),
            int8 AS (${QuantizeQuery.knnInt8.oracle.get}),
            hb AS (SELECT CAST(COUNT(*) AS BIGINT) AS h FROM brute a
                   JOIN brute b ON a.query_id = b.query_id
                              AND a.neighbor_id = b.neighbor_id),
            hivf AS (SELECT CAST(COUNT(*) AS BIGINT) AS h FROM ivf a
                     JOIN brute b ON a.query_id = b.query_id
                                AND a.neighbor_id = b.neighbor_id),
            hpq AS (SELECT CAST(COUNT(*) AS BIGINT) AS h FROM pq a
                    JOIN brute b ON a.query_id = b.query_id
                               AND a.neighbor_id = b.neighbor_id),
            hivfpq AS (SELECT CAST(COUNT(*) AS BIGINT) AS h FROM ivfpq a
                       JOIN brute b ON a.query_id = b.query_id
                                  AND a.neighbor_id = b.neighbor_id),
            hint8 AS (SELECT CAST(COUNT(*) AS BIGINT) AS h FROM int8 a
                      JOIN brute b ON a.query_id = b.query_id
                                 AND a.neighbor_id = b.neighbor_id),
            legs AS (
              SELECT 'brute' AS idx, 528 AS bytes_per_vec, 10 AS k_served,
                     (SELECT full_cand FROM fc) AS cand_rows,
                     (SELECT h FROM hb) AS h
              UNION ALL SELECT 'int8', 80, 10,
                     (SELECT full_cand FROM fc), (SELECT h FROM hint8)
              UNION ALL SELECT 'ivf', 532, 10,
                     (SELECT c FROM ic), (SELECT h FROM hivf)
              UNION ALL SELECT 'ivfpq', 16, 5,
                     (SELECT c FROM ipc), (SELECT h FROM hivfpq)
              UNION ALL SELECT 'pq', 12, 5,
                     (SELECT full_cand FROM fc), (SELECT h FROM hpq))
            SELECT idx, (SELECT n_rows FROM nr) AS n_rows,
                   CAST(bytes_per_vec AS BIGINT) AS bytes_per_vec,
                   ROUND(CAST((SELECT n_rows FROM nr) * bytes_per_vec
                     AS DOUBLE) / 1e6, 3) AS mb_resident,
                   CAST(k_served AS BIGINT) AS k_served,
                   CAST(cand_rows AS BIGINT) AS cand_rows,
                   ROUND(CAST(cand_rows AS DOUBLE)
                     / CAST((SELECT full_cand FROM fc) AS DOUBLE), 6)
                     AS scan_frac,
                   ROUND(CAST(h AS DOUBLE)
                     / CAST((SELECT t FROM t) AS DOUBLE), 6) AS recall
            FROM legs ORDER BY idx"""))

  val all: Seq[Q] = Seq(annCost)
}
