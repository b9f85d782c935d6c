package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate pair graph: every document
  * in a component gets the component's minimum doc id as its cluster id
  * (the "keeper"). This is the step that turns pairwise dedup verdicts
  * (minhash/simhash/cosine pairs) into actionable keep/drop sets.
  *
  * Implementation: iterative min-label propagation — each round joins the
  * current labels across the undirected edge set and takes the min of a
  * node's label and its neighbors' labels. Rounds needed = graph diameter
  * (near-dup components are tiny — usually 2–3 nodes), each round is one
  * co-partitioned join + aggregate, nothing on the driver except the
  * convergence check. The same loop structure GraphFrames uses, without
  * the dependency.
  */
object DedupClusters {

  /** @param edges DataFrame with two long columns (a, b), undirected pairs
    * @return (doc_id, cluster_id) for every node appearing in any edge
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val aCol = edges.columns(0)
    val bCol = edges.columns(1)
    val undirected = edges.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(edges.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .persist()

    // Eager localCheckpoint, not persist: every round must truncate the
    // LOGICAL PLAN, not just cache data — with persist alone the plan
    // grows by two joins per iteration and Catalyst re-analysis time
    // explodes (the classic iterative-algorithm pitfall).
    var labels = undirected.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(true)

    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // neighbor labels: for each node, the min label among its neighbors
      val neighborMin = undirected
        .join(labels.withColumnRenamed("id", "dst")
          .withColumnRenamed("label", "dst_label"), "dst")
        .groupBy(col("src").as("id"))
        .agg(min("dst_label").as("nbr_label"))
      val next = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr_label"), col("label")))
            .as("label"))
        .localCheckpoint(true)
      val changed = next.join(labels.withColumnRenamed("label", "old"), "id")
        .filter(col("label") =!= col("old")).limit(1).count()
      labels = next
      converged = changed == 0
      iter += 1
    }
    undirected.unpersist()
    labels.select(col("id").as("doc_id"), col("label").as("cluster_id"))
  }
}
