package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.ops.NgramLm

/** Streaming LM scoring contract: a streaming corpus scored against a
  * static broadcast model produces exactly the batch operator's
  * bits_sum per document, micro-batch by micro-batch, with a stateless
  * plan (stream-static broadcast joins — no state store, no watermark).
  */
class StreamLmSpec extends SparkSpec {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private def writeDocs(dir: String, rows: Seq[(Long, String)]): Unit = {
    import spark.implicits._
    rows.toDF("doc_id", "text").repartition(1)
      .write.mode("append").parquet(dir)
  }

  test("stream bits match the batch score across growing input") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("stream_lm").toString + "/docs"
    val train = Seq(
      (100L, "a b a b c a b"),
      (101L, "b c b c a"))
      .toDF("doc_id", "text")
    val m = NgramLm.train(train, "doc_id", "text")

    val gen1 = Seq(1L -> "a b c", 2L -> "c c c a")
    val gen2 = Seq(3L -> "b a b a", 4L -> "z z a b") // incl. unseen tokens
    writeDocs(dir, gen1)

    val stream = spark.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val bits = NgramLm.streamBits(stream, "doc_id", "text", m)
    assert(bits.isStreaming)

    val streamed = scala.collection.mutable.Map[Long, (Long, Long)]()
    val q = bits.writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // per-micro-batch per-doc aggregation is the caller's side
        batch.groupBy("doc_id")
          .agg(count(lit(1)).as("n"), sum("bits").as("bs"))
          .collect()
          .foreach(r => streamed(r.getLong(0)) = (r.getLong(1), r.getLong(2)))
        ()
      }.start()
    try {
      q.processAllAvailable()
      writeDocs(dir, gen2)
      q.processAllAvailable()
    } finally q.stop()

    val allDocs = (gen1 ++ gen2).toDF("doc_id", "text")
    val batchScores = NgramLm.score(allDocs, "doc_id", "text", m)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(streamed.toMap === batchScores)

    // stateless plan: no state store operator in the streaming plan
    val progress = q.lastProgress
    assert(progress == null || progress.stateOperators.isEmpty)
  }
}
