package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class Bm25Spec extends SparkSpec {

  private val terms = Seq("spark", "vector", "stream", "hash")

  test("materialized index probe equals in-query search exactly") {
    val docs = graft.queries.tbl(spark, sf(), "documents")
    val path = java.nio.file.Files
      .createTempDirectory("bm25_store").toString
    Bm25.buildIndex(docs, "doc_id", "text", path, nBuckets = 16)

    val direct = Bm25.search(docs, "doc_id", "text", terms)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val probed = Bm25.probeIndex(spark, path, "doc_id", terms)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(direct.nonEmpty)
    assert(probed.toSeq === direct.toSeq)
  }

  test("probe prunes the postings scan to the query terms' buckets") {
    val docs = graft.queries.tbl(spark, sf(), "documents")
    val path = java.nio.file.Files
      .createTempDirectory("bm25_prune").toString
    Bm25.buildIndex(docs, "doc_id", "text", path, nBuckets = 16)
    val plan = Bm25.probeIndex(spark, path, "doc_id", terms)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("tb"), plan)
    // the pruned scan must touch strictly fewer partitions than exist:
    // ≤ |terms| buckets of 16 written
    import spark.implicits._
    val hit = spark.createDataset(terms)
      .select(pmod(xxhash64(col("value")), lit(16L)))
      .as[Long].collect().distinct.length
    assert(hit < 16)
  }

  test("append ≡ rebuild: incremental index serves identical answers") {
    val docs = graft.queries.tbl(spark, sf(), "documents")
    val half1 = docs.filter(col("doc_id") % 2 === 0)
    val half2 = docs.filter(col("doc_id") % 2 =!= 0)
    val full = java.nio.file.Files
      .createTempDirectory("bm25_full").toString
    val inc = java.nio.file.Files
      .createTempDirectory("bm25_inc").toString
    Bm25.buildIndex(docs, "doc_id", "text", full, nBuckets = 16)
    Bm25.buildIndex(half1, "doc_id", "text", inc, nBuckets = 16)
    Bm25.appendToIndex(half2, "doc_id", "text", inc)

    val want = Bm25.probeIndex(spark, full, "doc_id", terms)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val got = Bm25.probeIndex(spark, inc, "doc_id", terms)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === want.toSeq)

    // compaction folds the doubled files per bucket, answers intact
    val reports = Bm25.compactIndex(spark, inc, targetFileBytes = 1L << 30)
    assert(reports.nonEmpty)
    val after = Bm25.probeIndex(spark, inc, "doc_id", terms)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(after.toSeq === want.toSeq)

    // stats-ledger compaction folds the per-append delta files while
    // preserving every delta row — totals identical after
    val statsBefore = Bm25.readStats(spark, inc).collect().head
    val sr = Bm25.compactStats(spark, inc, targetFileBytes = 1L << 30).get
    assert(sr.filesBefore >= sr.filesAfter)
    val statsAfter = Bm25.readStats(spark, inc).collect().head
    assert(statsAfter.getAs[Long]("n") === statsBefore.getAs[Long]("n"))
    assert(statsAfter.getAs[Long]("sdl") === statsBefore.getAs[Long]("sdl"))
  }

  test("two concurrent appends lose no delta (commutative stats ledger)") {
    // the old store kept ONE mutable stats row that each append
    // read-modified-overwrote: two interleaved appends both read the same
    // base and the last writer erased the other's delta. The ledger keeps
    // one delta row per batch and readers sum — appends commute. This
    // test runs the two appends GENUINELY concurrently on two threads.
    val docs = graft.queries.tbl(spark, sf(), "documents")
    val part0 = docs.filter(col("doc_id") % 3 === 0)
    val part1 = docs.filter(col("doc_id") % 3 === 1)
    val part2 = docs.filter(col("doc_id") % 3 === 2)
    val full = java.nio.file.Files
      .createTempDirectory("bm25_cfull").toString
    val inc = java.nio.file.Files
      .createTempDirectory("bm25_cinc").toString
    Bm25.buildIndex(docs, "doc_id", "text", full, nBuckets = 16)
    Bm25.buildIndex(part0, "doc_id", "text", inc, nBuckets = 16)

    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val appends = Seq(part1, part2).map(p => Future {
      Bm25.appendToIndex(p, "doc_id", "text", inc)
    })
    Await.result(Future.sequence(appends), 5.minutes)

    // ledger carries one delta row per batch; totals are exact
    val ledger = spark.read.parquet(s"$inc/stats").collect()
    assert(ledger.length === 3)
    val stats = Bm25.readStats(spark, inc).collect().head
    assert(stats.getAs[Long]("n") ===
      docs.filter(col("text").isNotNull).count())

    val want = Bm25.probeIndex(spark, full, "doc_id", terms)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val got = Bm25.probeIndex(spark, inc, "doc_id", terms)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === want.toSeq)
  }

  test("scores rank by exact integer and quantization round-trips") {
    val docs = graft.queries.tbl(spark, sf(), "documents")
    val out = Bm25.search(docs, "doc_id", "text", terms, topK = 10)
      .collect()
    val fps = out.map(_.getLong(2))
    assert(fps.toSeq === fps.sortBy(-_).toSeq) // descending by score_fp
    out.foreach { r =>
      assert(math.abs(r.getDouble(3) - r.getLong(2) / Bm25.Scale) < 1e-6)
      assert(r.getLong(1) >= 1 && r.getLong(1) <= terms.length)
    }
  }

  test("null/empty corpus degrades to a typed empty result") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Bm25.search(empty, "doc_id", "text", terms).count() === 0)
    val nulls = Seq((1L, null: String)).toDF("doc_id", "text")
    assert(Bm25.search(nulls, "doc_id", "text", terms).count() === 0)
  }
}
