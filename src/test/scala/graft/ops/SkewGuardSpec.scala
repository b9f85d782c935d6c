package graft.ops

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewGuardSpec extends SparkSpec {
  import spark.implicits._

  test("healthy buckets pass through with salt 0 and zero counters") {
    val banded = (1L to 30L).map(i => (i % 5, i)).toDF("bucket", "id")
    val obs = Observation("skew_healthy")
    val salted = SkewGuard.saltOversized(
      banded, Seq("bucket"), "id", cap = 10, obs = Some(obs))
    val rows = salted.collect()
    assert(rows.length === 30)
    assert(rows.forall(_.getAs[Int]("salt") === 0))
    val m = obs.get
    assert(m("oversized_rows") === 0L)
    assert(m("max_oversized_bucket") === 0L)
  }

  test("adversarial bucket is split into bounded salt groups; small " +
    "buckets untouched") {
    // one boilerplate-flooded bucket of 2000 next to healthy ones
    val banded = ((1L to 2000L).map(i => (99L, i)) ++
      (1L to 6L).map(i => (1L, i)) ++ (1L to 3L).map(i => (2L, i)))
      .toDF("bucket", "id")
    val obs = Observation("skew_adversarial")
    val cap = 50
    val salted = SkewGuard.saltOversized(
      banded, Seq("bucket"), "id", cap = cap, obs = Some(obs))

    val sizes = SkewGuard.groupSizes(salted, Seq("bucket")).collect()
    val hot = sizes.filter(_.getAs[Long]("bucket") === 99L)
    // ceil(2000/50) = 40 salt groups; a uniform hash keeps every group
    // within a small factor of the cap — the collect buffer is O(cap),
    // not O(bucket)
    assert(hot.length === 40)
    assert(hot.map(_.getAs[Long]("group_n")).sum === 2000L)
    assert(hot.forall(_.getAs[Long]("group_n") <= 3L * cap))
    // healthy buckets: exactly one group each, salt 0
    assert(sizes.filter(_.getAs[Long]("bucket") === 1L).map(
      _.getAs[Long]("group_n")).toSeq === Seq(6L))
    assert(salted.filter(col("bucket") =!= 99L)
      .select("salt").distinct().collect().map(_.getInt(0)).toSeq === Seq(0))

    val m = obs.get
    assert(m("oversized_rows") === 2000L)
    assert(m("max_oversized_bucket") === 2000L)
  }

  test("salting is deterministic: same input, same salt assignment") {
    val banded = (1L to 500L).map(i => (7L, i)).toDF("bucket", "id")
    def run() = SkewGuard.saltOversized(banded, Seq("bucket"), "id", cap = 20)
      .select("id", "salt").collect().map(r => (r.getLong(0), r.getInt(1)))
      .sortBy(_._1).toSeq
    assert(run() === run())
  }

  test("end-to-end: adversarial boilerplate corpus through the REAL " +
    "minhash query stays bounded; salted pairs are a subset of unsalted " +
    "with full precision") {
    val words = "the quick brown fox jumps over a lazy dog near the old " +
      "stone bridge by the river bank at dawn light"
    val boiler = (1L to 300L).map(i => (i, "en", words.length.toLong, words))
    val unique = (1001L to 1020L).map(i =>
      (i, "en", 60L, s"doc $i unique tokens alpha$i beta$i gamma$i " +
        s"delta$i epsilon$i zeta$i eta$i theta$i iota$i kappa$i"))
    val docs = (boiler ++ unique)
      .toDF("doc_id", "lang", "n_chars", "text")
    val tmp = java.nio.file.Files.createTempDirectory("skew_corpus").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")

    // unsalted ground truth (default cap 4096 > any bucket here)
    val unsalted = graft.queries.DedupQueries.minhashLsh
      .spark(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(unsalted.size === 300 * 299 / 2) // identical docs: all pairs

    // adversarial regime: cap 8 forces ~38-way salting of every band
    // bucket the boilerplate floods
    sys.props("graft.bucket.cap") = "8"
    try {
      val salted = graft.queries.DedupQueries.minhashLsh
        .spark(spark, tmp).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // the documented trade: within-salt pairs only — a nonempty strict
      // subset of the truth, with nothing spurious (precision 1)
      assert(salted.nonEmpty)
      assert(salted.subsetOf(unsalted))
      assert(salted.size < unsalted.size)
      // enough survives for transitive clustering to reconnect the
      // boilerplate: most duplicate docs still appear in some pair
      val covered = salted.flatMap(p => Seq(p._1, p._2))
      assert(covered.size >= 250)
    } finally sys.props.remove("graft.bucket.cap")
  }

  test("requirePairBound: returns the exact pair count under the bound, " +
    "refuses above it") {
    val df = (1L to 100L).map(i => (i, s"label${i % 4}"))
      .toDF("vec_id", "label")
    // 4 labels × 25 rows → Σ n² = 4 · 625 = 2500
    assert(SkewGuard.requirePairBound(df, Seq("label"), 2500L) === 2500L)
    val e = intercept[IllegalArgumentException] {
      SkewGuard.requirePairBound(df, Seq("label"), 2499L)
    }
    assert(e.getMessage.contains("quadratic verifier refused"))
    assert(e.getMessage.contains("SPARK_GRAFT_MAX_QUADRATIC_PAIRS"))
  }
}
