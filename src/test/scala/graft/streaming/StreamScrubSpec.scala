package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.ops.SpanScrub

/** Streaming span scrub contract: a document stream folded through the
  * persistent tile ledger micro-batch by micro-batch equals the one-shot
  * batch scrub of the same corpus (arrival order = id order), and a span
  * first seen in an EARLIER micro-batch is deleted from later ones —
  * cross-batch sub-document state no built-in streaming dedup expresses.
  */
class StreamScrubSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private def writeDocs(dir: String, rows: Seq[(Long, String)]): Unit = {
    import spark.implicits._
    rows.toDF("doc_id", "text").repartition(1)
      .write.mode("append").parquet(dir)
  }

  test("stream ≡ one-shot batch scrub across micro-batches") {
    import spark.implicits._
    val base = java.nio.file.Files
      .createTempDirectory("stream_scrub").toString
    val in = s"$base/in"; val out = s"$base/out"
    val ledger = s"$base/ledger"; val ckpt = s"$base/ckpt"

    val gen1 = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c x y z"))
    val gen2 = Seq(
      (3L, "x y z d e f p q r"), // every tile seen in gen1 except p q r
      (4L, "fresh words only here today"))
    writeDocs(in, gen1)

    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
    val q = SpanScrub.streamScrub(
      stream, "doc_id", "text", 3, ledger, out, ckpt)
    try {
      q.processAllAvailable()
      writeDocs(in, gen2)
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.read.parquet(out)
      .select("doc_id", "n_tiles", "n_removed", "scrubbed_text")
      .orderBy("doc_id").collect().toSeq
    val want = SpanScrub.scrub(
        (gen1 ++ gen2).toDF("doc_id", "text"), "doc_id", "text", 3)
      .select("doc_id", "n_tiles", "n_removed", "scrubbed_text")
      .orderBy("doc_id").collect().toSeq
    assert(got === want)
    // the cross-batch deletion actually happened: doc 3 lost its gen1
    // spans and kept only the novel tail
    assert(got.find(_.getLong(0) == 3L).get.getString(3) === "p q r")
  }
}
