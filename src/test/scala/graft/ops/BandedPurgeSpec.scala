package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Physical disposal for the banded bucketed signature store (r13
  * verdict missing #3): after [[SignatureStore.purgeBanded]] the banned
  * ids are PHYSICALLY absent from the table's files, the candidate join
  * stays shuffle-free on the store side (the rebuild preserves the
  * bucket spec), and answers equal the complement-corpus rebuild.
  */
class BandedPurgeSpec extends SparkSpec {
  import spark.implicits._

  private def docs: DataFrame =
    (0 until 30).map { i =>
      val body =
        if (i % 5 == 0) "alpha beta gamma delta epsilon zeta"
        else s"w${i}a w${i}b w${i}c w${i}d w${i}e w${i}f"
      (i.toLong, body)
    }.toDF("doc_id", "text")

  test("purgeBanded: banned ids physically absent from the table " +
    "files, bucket spec (and the shuffle-free store-side join) " +
    "preserved, answers equal the complement rebuild, ledger reset") {
    val table = "banded_purge_t"
    SignatureStore.buildBanded(docs, table, numBuckets = 4)
    SignatureStore.takedownBanded(spark, table, Seq(10L, 20L))

    val removed = SignatureStore.purgeBanded(spark, table)
    assert(removed > 0L)

    // physical absence: read the table's files RAW, not through a mask
    val loc = spark.sessionState.catalog.defaultTablePath(
      org.apache.spark.sql.catalyst.TableIdentifier(table)).toString
    val raw = spark.read.parquet(loc)
    assert(raw.filter(col("doc_id").isin(10L, 20L)).count() === 0L)
    assert(!graft.core.Fs.exists(spark, s"$loc/_tombstones"),
      "the rebuild must reset the ledger")

    // bucket spec preserved → store side still joins without its own
    // shuffle (the BucketingSpec discipline)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // the purge cleared the ledger (rebuild semantics), so the fresh
      // side is no longer masked — a post-purge dedup run probes with
      // the surviving corpus, same as any rebuilt store
      val joined = SignatureStore.bucketedNearDups(spark, table,
        docs.filter(!col("doc_id").isin(10L, 20L)))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"),
        "store scan lost its bucketing after the purge:\n" +
          plan.take(3000))

      // answers == a from-scratch banded build over the complement
      val twin = "banded_purge_twin"
      SignatureStore.buildBanded(
        docs.filter(!col("doc_id").isin(10L, 20L)), twin, numBuckets = 4)
      val key = (df: DataFrame) => df.select("ai", "bi").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val purged = key(joined)
      val complement = key(SignatureStore.bucketedNearDups(spark, twin,
        docs.filter(!col("doc_id").isin(10L, 20L))))
      assert(purged === complement)
      assert(purged.nonEmpty, "fixture has no near-dups — weak test")
      assert(!purged.exists(p => Set(10L, 20L)(p._1) ||
        Set(10L, 20L)(p._2)))
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("purgeBanded with no ledger is a no-op") {
    val table = "banded_purge_noop"
    SignatureStore.buildBanded(docs, table, numBuckets = 4)
    assert(SignatureStore.purgeBanded(spark, table) === 0L)
  }
}
