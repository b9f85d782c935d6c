package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Fs

/** Suppression anti-join for key sets too large to broadcast exactly —
  * "drop every document whose fingerprint is already in the previous
  * training runs" at 100 TB.
  *
  * The exact form of that contract is a shuffle anti-join: both sides
  * exchange on the key, and the corpus — the 100 TB side — pays a full
  * shuffle for what is almost always a miss. The broadcast form
  * (`Decontaminate.clean`) fixes that only while the suppression side
  * fits in memory as an exact set. This operator covers the remaining
  * regime: the suppression list is sketched into a [[graft.functions
  * .BloomAgg Bloom filter]] (10 bits/key at 1% fpp — 1 B keys ≈ 1.2 GB,
  * broadcastable where the exact 8-byte key set plus hash overhead is
  * not), the corpus probes it MAP-SIDE, and only probe HITS — true
  * matches plus the fpp sliver — continue into the exact anti-join.
  * Misses (the overwhelming majority) pass through with zero shuffle.
  *
  * The answer is EXACT: the sketch has no false negatives, so a
  * pass-through row provably has no partner; hits are re-verified by a
  * real anti-join, so false positives never drop a row. `q_bloom_suppress`
  * pins this cross-engine with a plain-anti-join DuckDB oracle.
  *
  * Differs from `q_bloom_prejoin` (ScaleQueries.scala), which hands
  * Spark's internal transient sketch to a SEMI join: this one (a) is an
  * ANTI join, where Spark's automatic runtime filtering never applies —
  * the probe must pass misses, not drop them; (b) persists — sketches are
  * a stable on-disk format with a union aggregate, so the suppression
  * list accrues per-shard in a ledger instead of being rebuilt from raw
  * keys every run; (c) has no conf-tied size caps.
  *
  * Reference analog: the checkpoint anti-join that keeps already-retrieved
  * custom_ids out of a batch poll (`background_retrieval.py:157-169`) —
  * same suppression contract, sketch-scaled.
  */
object BloomSuppress {

  /** Build one sketch over `keys.(keyCol)` (BIGINT). One map pass,
    * constant-size partial aggregation; the driver fetch is the sketch
    * itself — bounded model state (mBits/8 bytes), not data.
    *
    * `expectedKeys < 0` → count first (a second scan of the SUPPRESSION
    * side only; pass the known count to stay single-pass).
    */
  def sketch(
      keys: DataFrame,
      keyCol: String,
      fpp: Double = 0.01,
      expectedKeys: Long = -1L): Array[Byte] = {
    val n = if (expectedKeys >= 0) expectedKeys else keys.count()
    val (mBits, k) = graft.functions.BloomBits.size(n, fpp)
    keys.agg(expr(s"bloom_agg($keyCol, $mBits, $k)").as("bf"))
      .head().getAs[Array[Byte]]("bf")
  }

  /** `corpus` minus every row whose `keyCol` appears in `suppress`
    * (exact anti-join semantics, sketch-pruned shuffle). */
  def antiJoin(
      corpus: DataFrame,
      suppress: DataFrame,
      keyCol: String,
      fpp: Double = 0.01,
      expectedKeys: Long = -1L): DataFrame =
    antiJoinSketch(corpus, suppress, keyCol,
      sketch(suppress, keyCol, fpp, expectedKeys))

  /** [[antiJoin]] against an already-built sketch (e.g. read back from a
    * [[appendShard ledger]] and union-merged) — the steady-state path:
    * the suppression side's raw keys are only scanned to verify probe
    * hits, never to rebuild the filter.
    */
  /** Works on a STREAMING corpus too: the probe is a stateless map-side
    * filter and the verify branch a stream-static anti-join (supported,
    * stateless — no watermark/state store), so the same call suppresses
    * an ingest firehose inline with exact batch semantics
    * (StreamBloomSuppressSpec pins stream ≡ batch).
    *
    * Null keys: a null `keyCol` never enters the sketch (aggregate skips
    * nulls) and a null probe drops the row from BOTH branches — i.e.
    * null-keyed corpus rows are excluded from the result, matching SQL
    * `key NOT IN (non-null set)` UNKNOWN semantics. Fingerprint with a
    * null-safe expression (e.g. `md5num(coalesce(text, ''))`) if such
    * rows must survive.
    */
  def antiJoinSketch(
      corpus: DataFrame,
      suppress: DataFrame,
      keyCol: String,
      sketchBytes: Array[Byte]): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(corpus.sparkSession)
    val maybe = call_function("bloom_contains",
      typedLit(sketchBytes), col(keyCol))
    // No false negatives: a probe miss provably has no partner — emit
    // map-side. Hits re-verify through the exact anti-join; only they
    // (true matches + the fpp sliver of the corpus) are shuffled.
    val clean = corpus.filter(!maybe)
    val verified = corpus.filter(maybe)
      .join(suppress.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti")
    clean.unionByName(verified)
  }

  // ---------------------------------------------------------------------
  // Sketch ledger: the persistent form. One row per ingested shard —
  // (shard, n_keys, fpp, sketch bytes) — appended with the staged-commit
  // idiom (concurrent appenders safe, object-store safe). Reading unions
  // the shard sketches with bloom_merge_agg: the suppression list grows
  // incrementally without ever re-scanning old shards' raw keys.
  //
  // All shards must share (mBits, k) for the union to be defined, so the
  // ledger pins the geometry at creation time via `capacityKeys` — size
  // for the key volume the ledger will EVER hold, not the first shard
  // (10 bits/key: over-provisioning is cheap; re-sharding is not).
  // ---------------------------------------------------------------------

  /** Sketch `keys` as shard `shard` and append it to the ledger at
    * `dir`. Geometry comes from (capacityKeys, fpp) so every shard
    * merges; re-appending an existing shard id is fine (Bloom union is
    * idempotent).
    */
  def appendShard(
      keys: DataFrame,
      keyCol: String,
      dir: String,
      shard: String,
      capacityKeys: Long,
      fpp: Double = 0.01): Unit = {
    val s = keys.sparkSession
    graft.functions.GraftFunctions.ensureRegistered(s)
    val (mBits, k) = graft.functions.BloomBits.size(capacityKeys, fpp)
    val row = keys
      .agg(expr(s"bloom_agg($keyCol, $mBits, $k)").as("sketch"),
        count(col(keyCol)).as("n_keys"))
      .select(lit(shard).as("shard"), col("n_keys"),
        lit(fpp).as("fpp"), col("sketch"))
    Fs.stagedAppend(row.coalesce(1), None, dir)
  }

  /** Union of every shard sketch in the ledger — one binary. */
  def ledgerSketch(spark: SparkSession, dir: String): Array[Byte] = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    spark.read.parquet(dir)
      .agg(expr("bloom_merge_agg(sketch)").as("bf"))
      .head().getAs[Array[Byte]]("bf")
  }
}
