package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Guards for the blocking-key dedup/ANN family against adversarial skew.
  *
  * The bucket-expansion dedups (`q_dedup_minhash`, `q_dedup_simhash*`,
  * `q_dedup_embedding_lsh`) collect each LSH bucket's members into one
  * aggregation buffer and expand pairs inside it. LSH design bounds bucket
  * sizes on real data, but an adversarial corpus — near-identical
  * boilerplate flooding one band — makes a single bucket's `collect_list`
  * (and its O(n²) pair expansion) unbounded. [[saltOversized]] is the
  * escape hatch: buckets at or under `cap` pass through untouched (one
  * salt value, bit-identical results), oversized buckets are split into
  * `ceil(n/cap)` salt groups by a deterministic member hash, so every
  * task's buffer is O(cap) regardless of the corpus.
  *
  * The trade is explicit and observable: cross-salt pairs inside an
  * oversized bucket are not generated (within-salt pairs survive, and a
  * bucket that oversized is near-degenerate — its members are mutual
  * near-dups, so transitive clustering via [[DedupClusters]] reconnects
  * them from the surviving pairs). An `observe()` metric counts the rows
  * that landed in oversized buckets so the loss is visible in every run,
  * not just under profiling.
  */
object SkewGuard {

  /** Default per-bucket member cap. The binding constraint is NOT the
    * member buffer (O(cap)) but the pair expansion downstream: the
    * bucket queries flatten a C(cap,2)-element struct array per bucket
    * row BEFORE the verify filter, so per-task expansion memory is
    * O(cap²). At the original cap of 4096 that is ~8.4M structs
    * (~200 MB) in one row — measured at the sf10 decade, where capped
    * buckets doubled the per-candidate-pair cost (GC pressure) and were
    * an OOM hazard for wider structs. 1024 keeps the worst expansion
    * near 0.5M structs (~15 MB/task) and, on adversarially replicated
    * corpora, also bounds candidate growth to n·cap per oversized
    * bucket instead of n²/salts. Still far above any healthy LSH bucket
    * at every tested scale (sf0.1 max observed: 237), so oracle-scale
    * results are bit-identical. The system property lets specs drive
    * the real query pipelines through the salted path without a custom
    * corpus size.
    */
  def DefaultCap: Int = sys.props.get("graft.bucket.cap")
    .orElse(sys.env.get("SPARK_GRAFT_BUCKET_CAP"))
    .map(_.toInt).getOrElse(1024)

  /** Add a `salt` column that splits buckets larger than `cap`.
    *
    * Shape matters at scale: the bucket-size pass aggregates ONLY the key
    * columns (map-side partial agg, tiny shuffle), is filtered down to the
    * oversized buckets — at most corpus_rows/cap of them, each a key plus
    * a count, so broadcastable by construction — and is broadcast-LEFT-
    * joined back onto the banded frame. The member-carrying frame is never
    * shuffled by the guard: rows in healthy buckets miss the broadcast and
    * take salt 0 (bit-identical grouping to the unguarded plan); rows in
    * oversized buckets hash into `ceil(n/cap)` salt groups. Downstream
    * groupBys must include `salt` in their key.
    *
    * The metric `<metricName>.oversized_rows` counts rows in buckets past
    * the cap (0 on healthy corpora); `<metricName>.max_oversized_bucket`
    * is the largest such bucket (0 when none).
    */
  def saltOversized(
      banded: DataFrame,
      keys: Seq[String],
      idCol: String,
      cap: Int = DefaultCap,
      metricName: String = "skew_guard",
      obs: Option[org.apache.spark.sql.Observation] = None): DataFrame = {
    require(cap > 1, s"bucket cap must be > 1, got $cap")
    val kcols = keys.map(col)
    val oversized = banded.groupBy(kcols: _*)
      .agg(count(lit(1)).as("__bucket_n"))
      .filter(col("__bucket_n") > cap)
    val joined = banded.join(broadcast(oversized), keys, "left")
    val m1 = sum(when(col("__bucket_n").isNotNull, 1L).otherwise(0L))
      .as("oversized_rows")
    val m2 = coalesce(max(col("__bucket_n")), lit(0L))
      .as("max_oversized_bucket")
    (obs match {
      case Some(o) => joined.observe(o, m1, m2)
      case None => joined.observe(metricName, m1, m2)
    })
      .withColumn("salt",
        when(col("__bucket_n").isNull, lit(0))
          .otherwise(pmod(xxhash64(col(idCol)),
            ceil(col("__bucket_n").cast("double") / cap).cast("long"))
            .cast("int")))
      .drop("__bucket_n")
  }

  /** Fail-fast bound for the documented ground-truth quadratic verifiers
    * (`q_dedup_embedding`'s per-label all-pairs): computes the exact pair
    * count Σ block_size² the blocking key would generate and refuses to
    * run past `maxPairs`. The check itself is scale-safe — one count
    * aggregate and a single-row driver fetch — so the guard costs one
    * cheap job, not a scan of pairs that were never materialized.
    *
    * Returns the pair count so callers can log it. Raise the bound
    * explicitly (env `SPARK_GRAFT_MAX_QUADRATIC_PAIRS`) to opt in to a
    * bigger verification run; there is no implicit unbounded path.
    */
  val DefaultMaxQuadraticPairs: Long =
    sys.env.getOrElse("SPARK_GRAFT_MAX_QUADRATIC_PAIRS", "250000000").toLong

  def requirePairBound(
      df: DataFrame,
      blockCols: Seq[String],
      maxPairs: Long = DefaultMaxQuadraticPairs): Long = {
    val totalPairs = df.groupBy(blockCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .agg(coalesce(sum(col("__n") * col("__n")), lit(0L)).as("__pairs"))
      .head.getLong(0)
    require(totalPairs <= maxPairs,
      s"quadratic verifier refused: blocking on ${blockCols.mkString(",")} " +
        s"would generate $totalPairs candidate pairs > bound $maxPairs " +
        "(this is the exact ground-truth path — use the LSH-blocked scale " +
        "twin, or raise SPARK_GRAFT_MAX_QUADRATIC_PAIRS to opt in)")
    totalPairs
  }

  /** Convenience: recompute a salted frame's per-(key ++ salt) group sizes
    * (specs use this to assert the cap actually bounded every task).
    */
  def groupSizes(salted: DataFrame, keys: Seq[String]): DataFrame =
    salted.groupBy((keys :+ "salt").map(col): _*)
      .agg(count(lit(1)).as("group_n"))
}
