package graft.ops

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

class SignatureStoreSpec extends SparkSpec {

  private def docs = graft.queries.tbl(spark, sf(), "documents")
    .select("doc_id", "text")

  test("incremental dedup against a materialized store equals the " +
    "full-corpus run restricted to pairs touching the fresh batch") {
    val dir = java.nio.file.Files.createTempDirectory("sigstore").toString
    val old = docs.filter(col("doc_id") % 5 =!= 0)
    val fresh = docs.filter(col("doc_id") % 5 === 0)
    SignatureStore.build(old, dir)
    val store = SignatureStore.load(spark, dir)

    val incremental = SignatureStore.incrementalNearDups(store, fresh)
      .select("ai", "bi").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // ground truth: full-corpus LSH pairs, restricted to pairs where at
    // least one side is in the fresh batch
    val full = SignatureStore.incrementalNearDups(
      SignatureStore.signatures(docs).limit(0), docs)
      .select("ai", "bi").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = full.filter { case (a, b) => a % 5 == 0 || b % 5 == 0 }

    assert(incremental === expected)
    assert(expected.nonEmpty, "fixture has no cross-batch near-dups — weak test")
  }

  test("bucketed banded store: candidate join needs no store-side shuffle " +
    "(fewer Exchanges than the unbucketed control, same results)") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      def exchanges(df: org.apache.spark.sql.DataFrame): (Int, String) = {
        df.collect() // finalize the AQE plan before reading it
        val p = df.queryExecution.executedPlan.toString
        ("Exchange hashpartitioning".r.findAllIn(p).length, p)
      }

      SignatureStore.buildBanded(docs, "sig_store_banded_t", numBuckets = 4)
      val bucketed = SignatureStore.bucketedNearDups(
        spark, "sig_store_banded_t", docs)
      val (bn, bp) = exchanges(bucketed)
      assert(bp.contains("Bucketed: true"),
        "store scan not bucketed:\n" + bp.take(3000))

      // control: identical banded rows, plain parquet — the store side
      // must now shuffle, costing exactly one extra Exchange
      val dir = java.nio.file.Files.createTempDirectory("sigstore_b").toString
      SignatureStore.bandedSignatures(docs).write.mode("overwrite").parquet(dir)
      val control = SignatureStore.nearDupsAgainstBanded(
        spark.read.parquet(dir), docs)
      val (cn, _) = exchanges(control)
      // "Bucketed: true" already proves the scan's bucketing was exploited
      // (DisableUnnecessaryBucketedScan prints "disabled by query planner"
      // whenever an exchange sits above the scan anyway); the count check
      // pins that the whole plan got strictly cheaper, without depending
      // on AQE's exact exchange placement elsewhere
      assert(bn < cn,
        s"bucketed plan has $bn exchanges, control $cn:\n" + bp.take(3000))

      val key = (df: org.apache.spark.sql.DataFrame) =>
        df.select("ai", "bi").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(key(bucketed) === key(control))
      assert(key(bucketed).nonEmpty, "fixture has no near-dups — weak test")
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("stream-static band join flags arriving near-dups against the store") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("sigstore_s").toString
    SignatureStore.build(docs, dir)
    val store = SignatureStore.load(spark, dir)

    // an arriving doc that is an exact copy of a stored one (jaccard 1.0)
    val copied = docs.orderBy("doc_id").limit(1).collect().head
    val stream = MemoryStream(
      implicitly[org.apache.spark.sql.Encoder[(Long, String)]], spark)
    val q = SignatureStore.streamNearDups(
        stream.toDF().toDF("doc_id", "text"), store)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("neardups").start()
    try {
      stream.addData((999999L, copied.getString(1)))
      q.processAllAvailable()
      val hits = spark.table("neardups")
        .filter(col("new_id") === 999999L && col("dup_of") === copied.getLong(0))
        .select("jaccard").distinct().collect()
      assert(hits.length === 1)
      assert(hits.head.getDouble(0) === 1.0)
    } finally q.stop()
  }
}
