package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.ops.StatsLedger

/** Streaming data-skipping maintenance: an ingest stream lands parquet
  * batches AND extends the stats ledger in the same `foreachBatch` — the
  * shape that keeps a 100 TB/day table skippable continuously instead of
  * by a nightly stats rebuild. Each micro-batch computes stats for ITS
  * files only (`appendBatch`, staged concurrent-safe append); after the
  * stream, pruned reads over the accrued ledger answer exactly.
  */
class StreamStatsLedgerSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("k", LongType)))

  test("ledger accrued per micro-batch prunes and answers exactly") {
    import spark.implicits._
    val base = java.nio.file.Files
      .createTempDirectory("stream_ledger").toString
    val srcDir = s"$base/src"
    val tableDir = s"$base/table"
    val ledgerDir = s"$base/ledger"

    def feed(rows: Seq[(Long, Long)]): Unit =
      rows.toDF("id", "k").repartition(1)
        .write.mode("append").parquet(srcDir)

    feed((0L until 100L).map(i => (i, i % 50)))

    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir)
    val q = stream.writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        val dest = s"$tableDir/batch=$id"
        batch.repartitionByRange(2, col("k"))
          .write.mode("overwrite").parquet(dest)
        StatsLedger.appendBatch(batch.sparkSession, dest, ledgerDir,
          Seq("k"))
        ()
      }.start()
    try {
      q.processAllAvailable()
      feed((100L until 200L).map(i => (i, 50 + i % 50)))
      q.processAllAvailable()
    } finally q.stop()

    // ledger rows cover both micro-batches' files
    val files = StatsLedger.pruneFiles(spark, ledgerDir, Nil)
    assert(files.exists(_.contains("batch=0")) &&
      files.exists(_.contains("batch=1")))

    // a band wholly inside the SECOND batch's key range prunes the
    // first batch's files entirely
    val box = Seq(StatsLedger.Box.between("k", 80L, 90L))
    val kept = StatsLedger.pruneFiles(spark, ledgerDir, box)
    assert(kept.nonEmpty && kept.forall(!_.contains("batch=0")),
      s"batch-0 files should be pruned: $kept")
    val got = kept.map(spark.read.parquet(_)).reduce(_ unionByName _)
      .filter(col("k").between(80L, 90L))
      .agg(count(lit(1)), sum("id")).collect().head
    val all = spark.read.parquet(srcDir)
      .filter(col("k").between(80L, 90L))
      .agg(count(lit(1)), sum("id")).collect().head
    assert(got === all)
  }
}
