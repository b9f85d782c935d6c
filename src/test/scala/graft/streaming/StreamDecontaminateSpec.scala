package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.ops.Decontaminate

/** Streaming decontamination contract: a streaming corpus probed against a
  * static eval set flags exactly the documents the batch operator flags,
  * micro-batch by micro-batch, with a stateless plan (stream-static
  * broadcast join — no state store, no watermark).
  */
class StreamDecontaminateSpec extends SparkSpec {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private def writeDocs(dir: String, rows: Seq[(Long, String)]): Unit = {
    import spark.implicits._
    rows.toDF("doc_id", "text").repartition(1)
      .write.mode("append").parquet(dir)
  }

  test("stream flags match the batch exact-gram rule across growing input") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("stream_decon").toString + "/docs"
    val evalSet = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (101L, "pack my box with five dozen liquor jugs"))
      .toDF("doc_id", "text")

    val gen1 = Seq(
      1L -> "intro text then the quick brown fox jumps over it all", // hit
      2L -> "completely unrelated words in this document here")      // clean
    val gen2 = Seq(
      3L -> "shipping pack my box with five dozen liquor jugs today", // hit
      4L -> "more clean filler content that matches nothing at all")  // clean
    writeDocs(dir, gen1)

    val stream = spark.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val flags = Decontaminate.streamGramFlags(
      stream, evalSet, "doc_id", "text", n = 5)
    assert(flags.isStreaming)

    val flagged = scala.collection.mutable.Set[Long]()
    val q = flags.writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // per-micro-batch dedup is the caller's side of the contract
        flagged ++= batch.select("doc_id").distinct()
          .collect().map(_.getLong(0))
        ()
      }.start()
    try {
      q.processAllAvailable()
      assert(flagged.toSet === Set(1L))

      writeDocs(dir, gen2)
      q.processAllAvailable()
      assert(flagged.toSet === Set(1L, 3L))

      // cross-check: identical to the batch operator over the full corpus
      val batchIds = Decontaminate.exactGramHits(
          (gen1 ++ gen2).toDF("doc_id", "text"), evalSet,
          "doc_id", "text", n = 5)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(flagged.toSet === batchIds)
    } finally q.stop()
  }

  test("plan is stateless: broadcast stream-static join, no state store") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("stream_decon_plan").toString + "/docs"
    writeDocs(dir, Seq(1L -> "a b c d e f"))
    val evalSet = Seq((9L, "a b c d e z")).toDF("doc_id", "text")
    val flags = Decontaminate.streamGramFlags(
      spark.readStream.schema(docSchema).parquet(dir),
      evalSet, "doc_id", "text", n = 5)
    val q = flags.writeStream.outputMode("append")
      .format("memory").queryName("decon_plan").start()
    try {
      q.processAllAvailable()
      val plan = org.apache.spark.sql.graftshim.streamPlan(q)
      assert(plan.contains("BroadcastHashJoin"), plan)
      assert(!plan.contains("StateStore"), s"stateless contract violated:\n$plan")
    } finally q.stop()
  }
}
