package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FreqSketchSpec extends SparkSpec {
  import spark.implicits._

  private def ensure() = GraftFunctions.ensureRegistered(spark)

  test("exact regime: below the map size the sketch IS the exact answer, " +
    "independent of partitioning") {
    ensure()
    // 10 distinct items, heavily skewed; far below a 64-slot map
    val rows = (1 to 1000).map(i => s"item${i % 10}") ++
      Seq.fill(500)("item3")
    for (parts <- Seq(1, 7)) {
      val df = rows.toDF("s").repartition(parts)
      val out = df.agg(
        expr("freq_sketch_top1(freq_sketch_agg(s, 64))").as("top"),
        expr("freq_sketch_estimate(freq_sketch_agg(s, 64), 'item3')").as("est"),
        expr("freq_sketch_ub(freq_sketch_agg(s, 64), 'item3')" +
          " - freq_sketch_lb(freq_sketch_agg(s, 64), 'item3')").as("err"))
        .collect().head
      assert(out.getString(0) === "item3")
      assert(out.getLong(1) === 600L) // 100 + 500, exact
      assert(out.getLong(2) === 0L)
    }
  }

  test("eviction regime: bounds bracket the true count and the dominant " +
    "heavy hitter survives a stream with cardinality >> map size") {
    ensure()
    // 5000 distinct rare items + one heavy hitter, map of only 16 slots
    val rng = new scala.util.Random(42)
    val rows = rng.shuffle(
      (1 to 5000).map(i => s"rare$i") ++ Seq.fill(2000)("heavy"))
    val df = rows.toDF("s").repartition(8)
    val out = df.agg(
      expr("freq_sketch_top1(freq_sketch_agg(s, 16))").as("top"),
      expr("freq_sketch_lb(freq_sketch_agg(s, 16), 'heavy')").as("lb"),
      expr("freq_sketch_estimate(freq_sketch_agg(s, 16), 'heavy')").as("est"),
      expr("freq_sketch_ub(freq_sketch_agg(s, 16), 'heavy')").as("ub"))
      .collect().head
    // NO_FALSE_NEGATIVES: a count this dominant cannot be evicted
    assert(out.getString(0) === "heavy")
    // the deterministic sketch guarantee: lb <= true <= ub, est in [lb,ub]
    assert(out.getLong(1) <= 2000L && 2000L <= out.getLong(3))
    assert(out.getLong(1) <= out.getLong(2) && out.getLong(2) <= out.getLong(3))
  }

  test("merge law: merging per-shard serialized sketches equals sketching " +
    "the union, within bounds") {
    ensure()
    val a = (1 to 300).map(i => ("a", s"w${i % 5}"))
    val b = (1 to 700).map(i => ("b", s"w${i % 5}"))
    val shards = (a ++ b).toDF("shard", "s")
      .groupBy("shard").agg(expr("freq_sketch_agg(s, 64)").as("sk"))
    val merged = shards
      .agg(expr("freq_sketch_estimate(freq_merge_agg(sk, 64), 'w0')"))
      .collect().head.getLong(0)
    // w0 appears for i % 5 == 0: 60 in shard a + 140 in shard b
    assert(merged === 200L)
  }

  test("frequent-items aggregate inside a streaming window: state-store " +
    "merges accumulate counts across micro-batches") {
    ensure()
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    val stream = MemoryStream(
      implicitly[org.apache.spark.sql.Encoder[(java.sql.Timestamp, String)]],
      spark)
    val windowed = stream.toDF().toDF("ts", "s")
      .withWatermark("ts", "5 minutes")
      .groupBy(window(col("ts"), "60 minutes"))
      .agg(expr("freq_sketch_top1(freq_sketch_agg(s, 64))").as("top"),
        expr("freq_sketch_estimate(freq_sketch_agg(s, 64), 'b')").as("est_b"))
    val q = windowed.writeStream.outputMode(OutputMode.Complete)
      .format("memory").queryName("freqwin").start()
    try {
      def ts(m: Int) = new java.sql.Timestamp(1700000000000L + m * 60000L)
      // batch 1: 'a' leads; batch 2 flips the winner to 'b' — only a
      // MERGED sketch (not a replaced one) can know that
      stream.addData((1 to 30).map(i => (ts(i % 20), "a")) ++
        (1 to 20).map(i => (ts(i % 20), "b")): _*)
      q.processAllAvailable()
      stream.addData((1 to 25).map(i => (ts(i % 20), "b")): _*)
      q.processAllAvailable()
      val row = spark.table("freqwin").collect().head
      assert(row.getString(1) === "b")
      assert(row.getLong(2) === 45L) // 20 + 25, exact below map size
    } finally q.stop()
  }

  test("sketch column survives a parquet round trip and re-aggregation") {
    ensure()
    val tmp = java.nio.file.Files.createTempDirectory("freq_store").toString
    (1 to 500).map(i => (i % 3, s"t${i % 7}")).toDF("day", "s")
      .groupBy("day").agg(expr("freq_sketch_agg(s, 64)").as("sk"))
      .write.mode("overwrite").parquet(tmp)
    val est = spark.read.parquet(tmp)
      .agg(expr("freq_sketch_estimate(freq_merge_agg(sk, 64), 't1')"))
      .collect().head.getLong(0)
    assert(est === (1 to 500).count(_ % 7 == 1).toLong)
  }
}
