package graft.streaming

import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.ops.MergeStore

/** Streaming CDC apply contract: a change-log stream folded into
  * [[MergeStore]] micro-batch by micro-batch equals the batch merge of
  * the same changes, and re-delivery of an already-applied batch is a
  * no-op — exactly-once with NO commit markers, because LWW merge is
  * idempotent and commutative (the algebra, not a transaction log, is
  * the replay protection).
  */
class StreamCdcSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("seq", LongType),
    StructField("is_delete", BooleanType), StructField("v", DoubleType)))

  private def writeChanges(
      dir: String, rows: Seq[(Long, Long, Boolean, Double)]): Unit = {
    import spark.implicits._
    rows.toDF("k", "seq", "is_delete", "v").repartition(1)
      .write.mode("append").parquet(dir)
  }

  private def state(path: String): Map[Long, (Long, Double)] =
    MergeStore.read(spark, path).collect()
      .map(r => r.getAs[Long]("k") ->
        (r.getAs[Long]("seq"), r.getAs[Double]("v"))).toMap

  test("stream apply ≡ batch merges across generations; replay no-op") {
    val base = java.nio.file.Files
      .createTempDirectory("stream_cdc").toString
    val changesDir = s"$base/changes"
    val storePath = s"$base/store"
    val ckpt = s"$base/ckpt"

    val gen1 = Seq(
      (1L, 10L, false, 1.0), (2L, 11L, false, 2.0), (3L, 12L, false, 3.0))
    val gen2 = Seq(
      (1L, 20L, false, 1.5),  // update key 1
      (2L, 21L, true, 0.0),   // delete key 2
      (4L, 22L, false, 4.0))  // insert key 4
    writeChanges(changesDir, gen1)

    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(changesDir)
    val q = MergeStore.streamApply(stream, storePath, "k", 4, ckpt)
    try {
      q.processAllAvailable()
      assert(state(storePath) ===
        Map(1L -> (10L, 1.0), 2L -> (11L, 2.0), 3L -> (12L, 3.0)))

      writeChanges(changesDir, gen2)
      q.processAllAvailable()
      val after = state(storePath)
      assert(after ===
        Map(1L -> (20L, 1.5), 3L -> (12L, 3.0), 4L -> (22L, 4.0)))

      // re-delivery: re-merge BOTH generations directly (the crash-replay
      // shape — an applied batch arrives again). LWW ties change nothing:
      // no resurrection of deleted key 2, no rollback of key 1.
      import spark.implicits._
      MergeStore.merge(spark, storePath,
        gen1.toDF("k", "seq", "is_delete", "v"), "k", 4)
      MergeStore.merge(spark, storePath,
        gen2.toDF("k", "seq", "is_delete", "v"), "k", 4)
      assert(state(storePath) === after)
    } finally q.stop()
  }

  test("restart from the same checkpoint re-processes nothing") {
    val base = java.nio.file.Files
      .createTempDirectory("stream_cdc_restart").toString
    val changesDir = s"$base/changes"
    val storePath = s"$base/store"
    val ckpt = s"$base/ckpt"
    writeChanges(changesDir, Seq((1L, 10L, false, 1.0)))

    def run(): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(changesDir)
      val q = MergeStore.streamApply(stream, storePath, "k", 4, ckpt)
      try q.processAllAvailable() finally q.stop()
    }
    run()
    val first = state(storePath)
    run() // same checkpoint: no new files → no merges, state unchanged
    assert(state(storePath) === first)
    assert(first === Map(1L -> (10L, 1.0)))
  }
}
