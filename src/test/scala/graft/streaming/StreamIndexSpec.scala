package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.ops.{KMeans, ProductQuantizer}

/** Streaming index maintenance contract: streamed codes are exactly the
  * batch encoder's codes, a replayed micro-batch cannot double a vector,
  * the streaming plan is stateless, and serving over main ∪ tail equals
  * one batch-built store over the full corpus (with DPP intact on the
  * main side).
  */
class StreamIndexSpec extends SparkSpec {

  private val streamSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("v", ArrayType(DoubleType)),
    StructField("nrm", DoubleType)))

  private def corpus() = {
    import graft.queries.tbl
    tbl(spark, sf(), "embeddings")
      .filter(col("embedding").isNotNull)
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
      .withColumn("nrm", expr("dot_product(v, v)"))
  }

  test("streamed tail ≡ batch encoding, exactly-once under replay, " +
    "stateless plan; main ∪ tail serving ≡ full batch store with DPP") {
    val e = corpus()
    val cents = KMeans.lloyd(e, 8, 2)
    val books = ProductQuantizer.train(e, "v", 64, 4, 8, 2)

    val base = e.filter(col("vec_id") % 3 =!= 2)
    val gen1 = e.filter(col("vec_id") % 3 === 2 && col("vec_id") % 2 === 0)
    val gen2 = e.filter(col("vec_id") % 3 === 2 && col("vec_id") % 2 === 1)

    val root = java.nio.file.Files.createTempDirectory("stream_idx").toString
    val (srcDir, mainDir, tailDir, ckpt) =
      (s"$root/src", s"$root/main", s"$root/tail", s"$root/ckpt")

    // main store: batch-built from the base slice under the frozen models
    ProductQuantizer.buildStore(base, "v", books, cents, mainDir)

    // tail: two streamed generations through the exactly-once sink
    gen1.repartition(1).write.mode("append").parquet(srcDir)
    val q = StreamIndex.start(
      spark.readStream.schema(streamSchema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir),
      books, cents, tailDir, ckpt)
    try {
      q.processAllAvailable()
      gen2.repartition(1).write.mode("append").parquet(srcDir)
      q.processAllAvailable()

      // stateless: stream-static projection only, no state operators
      val progress = q.lastProgress
      assert(progress == null || progress.stateOperators.isEmpty)
    } finally q.stop()

    // tail codes are EXACTLY the batch encoder's output for those rows
    val tailRows = IdempotentSink
      .readCommitted(spark, tailDir, Some(StreamIndex.tailSchema))
      .select("vec_id", "codes", "bucket").collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1), r.getInt(2))).sortBy(_._1)
    val batchRows = StreamIndex.encode(gen1.unionByName(gen2), books, cents)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1), r.getInt(2))).sortBy(_._1)
    assert(tailRows.nonEmpty)
    assert(tailRows === batchRows)

    // a replayed (already committed) micro-batch id writes nothing
    val before = IdempotentSink
      .readCommitted(spark, tailDir, Some(StreamIndex.tailSchema)).count()
    assert(!IdempotentSink.writeBatch(
      StreamIndex.encode(gen1, books, cents), tailDir, 0L))
    val after = IdempotentSink
      .readCommitted(spark, tailDir, Some(StreamIndex.tailSchema)).count()
    assert(after === before)

    // serving: main ∪ tail ≡ one batch store built from the FULL corpus
    val queries = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"))
    val served = StreamIndex.probeWithTail(
      spark, mainDir, tailDir, queries, books, cents, nProbe = 2, topK = 5)
      .orderBy("query_id", "rnk")
    val fullDir = s"$root/full"
    ProductQuantizer.buildStore(e, "v", books, cents, fullDir)
    val full = ProductQuantizer.probeStore(
      spark, fullDir, queries, books, cents, nProbe = 2, topK = 5)
      .orderBy("query_id", "rnk")
    val key = (df: org.apache.spark.sql.DataFrame) => df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(key(served) === key(full))
    assert(key(full).nonEmpty)

    // the main-store side of the union still dynamic-partition-prunes
    served.collect()
    assert(served.queryExecution.executedPlan.toString
      .toLowerCase.contains("dynamicpruning"),
      "main-store scan under the union lost dynamic partition pruning")
  }
}
