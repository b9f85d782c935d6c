package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.DedupClusters

/** Cluster near-dup pairs into connected components: each clustered doc
  * → its keeper (min doc id in the component). The oracle computes the
  * same fixpoint with a recursive transitive-closure CTE — an
  * independent algorithm for the same semantics.
  *
  * Pairs come from the MinHash-LSH miner (`q_dedup_minhash`), the
  * documented 100 TB path: the cluster chain previously replayed the
  * exact length-blocked miner, whose candidate set is quadratic per
  * bucket (measured ×100 per decade on the sf1 leg — 180M candidates),
  * so every cluster build inherited a baseline that is only meant for
  * ground-truthing. The oracle embeds the minhash pair SQL, so recall
  * semantics stay pinned cross-engine.
  */
object DedupClusterQuery {

  val clusters = Q(
    "q_dedup_clusters",
    (s, dir) => {
      val pairs = DedupQueries.minhashLsh.spark(s, dir)
        .select(col("ai"), col("bi"))
      DedupClusters.connectedComponents(pairs)
        .orderBy("doc_id")
    },
    DedupQueries.minhashLsh.oracle.map { pairSql =>
      // strip the trailing ORDER BY of the pair query before embedding
      val inner = pairSql.substring(0, pairSql.lastIndexOf("ORDER BY"))
      s"""WITH RECURSIVE pair_q AS ($inner),
          edges AS (
            SELECT ai AS a, bi AS b FROM pair_q
            UNION
            SELECT bi AS a, ai AS b FROM pair_q),
          reach(id, r) AS (
            SELECT a, a FROM edges
            UNION
            SELECT reach.id, e.b FROM reach JOIN edges e ON reach.r = e.a)
          SELECT id AS doc_id, MIN(r) AS cluster_id
          FROM reach GROUP BY id ORDER BY doc_id"""
    })

  /** The curation capstone: near-dup clusters → ONE canonical document
    * per cluster, chosen by quality score (tie: lowest doc id) — the
    * keep-best-of-duplicates step every training-data pipeline runs
    * after dedup. Composes three oracle-checked stages (pair mining,
    * connected components, quality scoring); the argmax is encoded as
    * max over struct(quality, −doc_id), so one aggregation replaces a
    * per-cluster window. The oracle recomputes the whole chain
    * independently (recursive CTE + ROW_NUMBER).
    */
  val canonicalDocs = Q(
    "q_canonical_docs",
    (s, dir) => {
      val pairs = DedupQueries.minhashLsh.spark(s, dir)
        .select(col("ai"), col("bi"))
      val clusters = DedupClusters.connectedComponents(pairs)
      val quality = TextQueries.qualityScore.spark(s, dir)
        .select(col("doc_id"), col("quality"))
      clusters.join(quality, "doc_id")
        .groupBy("cluster_id")
        .agg(
          max(struct(col("quality").as("q"), (-col("doc_id")).as("nd")))
            .as("best"),
          cnt("n_members"))
        .select(col("cluster_id"), (-col("best.nd")).as("keeper"),
          col("best.q").as("best_quality"), col("n_members"))
        .orderBy("cluster_id")
    },
    clusters.oracle.map { clusterSql =>
      val inner = clusterSql.substring(0, clusterSql.lastIndexOf("ORDER BY"))
      s"""WITH q AS (
            SELECT doc_id,
                   ROUND(LEAST(1.0, CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0) * 0.6
                     + (CAST(len(list_filter(string_split(text, ' '),
                         w -> w in (${TextQueries.stopList}))) AS DOUBLE)
                        / CAST(len(string_split(text, ' ')) AS DOUBLE)) * 0.4, 4) AS quality
            FROM documents)
          SELECT cluster_id, doc_id AS keeper, quality AS best_quality,
                 n_members
          FROM (
            SELECT c.cluster_id, c.doc_id, q.quality,
                   CAST(COUNT(*) OVER (PARTITION BY c.cluster_id) AS BIGINT)
                     AS n_members,
                   ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                     ORDER BY q.quality DESC, c.doc_id) AS rn
            FROM ($inner) c JOIN q USING (doc_id))
          WHERE rn = 1 ORDER BY cluster_id"""
    })
}
