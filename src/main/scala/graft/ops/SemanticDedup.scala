package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup-style semantic deduplication over an embedding column
  * (Abbas et al. 2023: cluster the corpus with a coarse quantizer, then
  * drop all-but-one of each group of semantically near-identical points
  * WITHIN a cluster — cross-cluster pairs are never compared, which is
  * what makes the quadratic tractable).
  *
  * Scale shape (100 TB corpus): cluster assignment is map-only — the
  * centroid set is model state (bounded, driver-side literals folded into
  * the projection, exactly like [[VectorIndex.assignBucket]]). The only
  * quadratic is per-cluster, and cluster size is a knob (pick k so the
  * biggest cluster's pair count fits the verification budget);
  * [[SkewGuard.requirePairBound]] makes that an executable contract
  * rather than a hope. The keep/drop rule is "drop a point iff an
  * EARLIER (lower-id) point of the same cluster is within `threshold`
  * cosine" — deterministic, order-free (no iterative greedy pass whose
  * result depends on visit order), and exactly replayable by the DuckDB
  * oracle (`q_semantic_dedup`).
  *
  * The heavy vector columns never travel through the mark join: the pair
  * join carries (bucket, id, v, nrm) per side but its OUTPUT is just
  * dropped ids, and the final mark join is id↔id — narrow rows both ways.
  */
object SemanticDedup {

  /** Mark every row of `assigned` (must carry `idCol`, `v`, `nrm`,
    * `bucket`) with `kept`: false iff some lower-id same-bucket row has
    * cosine ≥ `threshold`. Returns (idCol, bucket, kept) rows.
    */
  def mark(
      assigned: DataFrame,
      idCol: String,
      threshold: Double,
      maxPairs: Long = SkewGuard.DefaultMaxQuadraticPairs): DataFrame = {
    // `assigned` is consumed FOUR times (the pair-bound gate, both pair
    // sides, the final keep-mark join), and for every caller it embeds
    // the cluster assignment — n × k centroid dot products in the
    // projection. Unpersisted, that map work (and the corpus scan under
    // it) re-runs per consumer: four assignment passes where one
    // suffices. Persist is intra-query state; the session's
    // clearCache()/unpersist discipline frees it after the run.
    val cached = assigned
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    SkewGuard.requirePairBound(cached, Seq("bucket"), maxPairs)
    val a = cached.select(col("bucket"), col(idCol).as("__ai"),
      col("v").as("__av"), col("nrm").as("__an"))
    val b = cached.select(col("bucket").as("__bbucket"),
      col(idCol).as("__bi"), col("v").as("__bv"), col("nrm").as("__bn"))
    val dropped = a.join(b,
        col("bucket") === col("__bbucket") && col("__bi") < col("__ai"))
      .filter(expr("dot_product(__av, __bv)")
        / sqrt(col("__an") * col("__bn")) >= threshold)
      .select(col("__ai").as(idCol)).distinct()
      .withColumn("__dropped", lit(1))
    cached.select(col(idCol), col("bucket"))
      .join(dropped, Seq(idCol), "left")
      .select(col(idCol), col("bucket"),
        col("__dropped").isNull.as("kept"))
  }
}
