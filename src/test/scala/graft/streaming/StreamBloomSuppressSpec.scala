package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.ops.BloomSuppress

/** Streaming suppression contract: [[BloomSuppress.antiJoinSketch]] works
  * UNCHANGED on a streaming corpus — the probe is a map-side filter and
  * the verify branch is a stream-static anti-join, both stateless (no
  * watermark, no state store), so a 100 TB/day ingest can be suppressed
  * inline at file-arrival time with exact batch semantics. The spec
  * pins: streaming survivors ≡ batch survivors, micro-batch by
  * micro-batch, across a growing input.
  */
class StreamBloomSuppressSpec extends SparkSpec {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("fp", LongType)))

  test("streaming survivors equal the batch anti-join across micro-batches") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("stream_bloom").toString + "/docs"
    // suppression list: fingerprints 100..149
    val suppress = (100L until 150L).toDF("fp")
    val bf = BloomSuppress.sketch(suppress, "fp")

    def writeDocs(rows: Seq[(Long, Long)]): Unit =
      rows.toDF("doc_id", "fp").repartition(1)
        .write.mode("append").parquet(dir)

    val gen1 = Seq(1L -> 100L, 2L -> 7L, 3L -> 149L, 4L -> 500L)
    val gen2 = Seq(5L -> 120L, 6L -> 8L)
    writeDocs(gen1)

    val stream = spark.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val survivors = BloomSuppress.antiJoinSketch(stream, suppress, "fp", bf)
    assert(survivors.isStreaming)

    val kept = scala.collection.mutable.Set[Long]()
    val q = survivors.writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        kept ++= batch.select("doc_id").collect().map(_.getLong(0))
        ()
      }.start()
    try {
      q.processAllAvailable()
      assert(kept.toSet === Set(2L, 4L))

      writeDocs(gen2)
      q.processAllAvailable()
      assert(kept.toSet === Set(2L, 4L, 6L))
    } finally q.stop()

    // batch replay of the full input agrees
    val batchKept = BloomSuppress.antiJoinSketch(
        spark.read.parquet(dir), suppress, "fp", bf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(batchKept === kept.toSet)
  }
}
