package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materialized MinHash signature table — the production shape of
  * near-dup detection at 100 TB, where signatures are computed ONCE per
  * document and reused by every later dedup run (the in-query `persist`
  * the oracle queries use is the single-job equivalent; see SCALE.md).
  *
  * Workflow:
  *   1. `build` writes (doc_id, s, sig) parquet from a corpus — one
  *      scan→shingle→hash pass, embarrassingly parallel.
  *   2. `incrementalNearDups` dedups a NEW batch against store + batch
  *      without recomputing old signatures: LSH band join on the
  *      signature table, exact-Jaccard verify on candidates only.
  *   3. `streamNearDups` is the streaming twin: a stream-static band
  *      join flags near-dups of arriving documents against the store
  *      with no stream-side state beyond the running micro-batch.
  *
  * At scale, write the store bucketed by band value so the candidate
  * join co-locates without a shuffle on the store side.
  */
object SignatureStore {

  /** (doc_id, s, sig): distinct 3-gram shingles + 16-slot MinHash
    * signature (native `minhash_sig` kernel).
    */
  def signatures(docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(docs.sparkSession)
    docs.select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"),
        expr("""array_distinct(transform(
                  sequence(1, size(w) - 2),
                  i -> concat_ws(' ', slice(w, i, 3))))""").as("s"))
      .select(col("doc_id"), col("s"), expr("minhash_sig(s)").as("sig"))
  }

  def build(docs: DataFrame, path: String): Unit =
    signatures(docs).write.mode("overwrite").parquet(path)

  def load(spark: SparkSession, path: String): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    spark.read.parquet(path)
  }

  /** 4×4 LSH band explosion of a signature frame. */
  private def bands(sigs: DataFrame): DataFrame =
    sigs.select(col("doc_id"), col("s"),
      posexplode(expr(
        "transform(sequence(0, 3), b -> slice(sig, b * 4 + 1, 4))")))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bvals")

  /** Near-dup pairs (ai < bi, jaccard ≥ threshold) where at least one
    * side is from `freshDocs`: fresh×store and fresh×fresh candidates
    * come from the band join; store×store pairs are already known from
    * the store's own build-time dedup and are not recomputed.
    */
  def incrementalNearDups(
      store: DataFrame,
      freshDocs: DataFrame,
      threshold: Double = 0.5): DataFrame = {
    val fresh = signatures(freshDocs)
    val all = store.select("doc_id", "s", "sig")
      .unionByName(fresh.select("doc_id", "s", "sig"))
    val fb = bands(fresh).select(col("band"), col("bvals"),
      col("doc_id").as("f_id"), col("s").as("f_s"))
    val ab = bands(all).select(col("band"), col("bvals"),
      col("doc_id").as("a_id"), col("s").as("a_s"))
    fb.join(ab, Seq("band", "bvals"))
      .filter(col("f_id") =!= col("a_id"))
      .select(
        least(col("f_id"), col("a_id")).as("ai"),
        greatest(col("f_id"), col("a_id")).as("bi"),
        // jaccard_sim is exactly symmetric, so both orientations of a
        // pair produce the identical double and distinct() collapses them
        expr("jaccard_sim(f_s, a_s)").as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .distinct()
  }

  /** Streaming twin: arriving documents band-join the static store.
    * Stream-static inner joins need no watermark and no stream state —
    * each micro-batch probes the store and emits its own near-dups.
    * A pair sharing several bands appears once per shared band; dedup in
    * the sink (`foreachBatch` + dropDuplicates) if exactly-once pairs
    * matter downstream.
    */
  def streamNearDups(
      streamDocs: DataFrame,
      store: DataFrame,
      threshold: Double = 0.5): DataFrame = {
    val sb = bands(signatures(streamDocs)).select(col("band"), col("bvals"),
      col("doc_id").as("new_id"), col("s").as("new_s"))
    val stb = bands(store).select(col("band"), col("bvals"),
      col("doc_id").as("dup_of"), col("s").as("store_s"))
    sb.join(stb, Seq("band", "bvals"))
      .filter(col("new_id") =!= col("dup_of"))
      .withColumn("jaccard", expr("jaccard_sim(new_s, store_s)"))
      .filter(col("jaccard") >= threshold)
      .select("new_id", "dup_of", "jaccard")
  }
}
