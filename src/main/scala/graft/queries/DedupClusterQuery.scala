package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.DedupClusters

/** Cluster the n-gram-Jaccard near-dup pairs into connected components:
  * each clustered doc → its keeper (min doc id in the component). The
  * oracle computes the same fixpoint with a recursive transitive-closure
  * CTE — an independent algorithm for the same semantics.
  */
object DedupClusterQuery {

  val clusters = Q(
    "q_dedup_clusters",
    (s, dir) => {
      val pairs = DedupQueries.ngramJaccard.spark(s, dir)
        .select(col("ai"), col("bi"))
      DedupClusters.connectedComponents(pairs)
        .orderBy("doc_id")
    },
    DedupQueries.ngramJaccard.oracle.map { pairSql =>
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
}
