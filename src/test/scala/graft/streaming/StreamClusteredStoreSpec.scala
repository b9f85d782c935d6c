package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.ops.ClusteredStore

/** Streaming clustered maintenance: each micro-batch is absorbed into
  * the z/Hilbert-clustered store via bounded-scope compaction
  * ([[graft.ops.ClusteredStore.appendStream]]) — the continuously-
  * optimized-table shape, where ingest keeps the layout skippable
  * instead of a nightly OPTIMIZE rewriting the world. Exactly-once
  * comes from the ledger swap being the commit point: the batch id is
  * stamped on the rows it commits, so a re-delivered batch probes the
  * ledger and no-ops.
  */
class StreamClusteredStoreSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("a", LongType),
    StructField("b", LongType)))

  test("micro-batches absorb with bounded rewrites; a replayed batch " +
    "id is a no-op; final content equals the batch union") {
    import spark.implicits._
    val base = java.nio.file.Files
      .createTempDirectory("stream_cluster").toString
    val srcDir = s"$base/src"
    val storeDir = s"$base/store"

    def rows(r: Range) =
      r.map(i => (i.toLong, i.toLong * 7919 % 1000, i.toLong * 104729 % 1000))
    // each micro-batch is LOCALIZED in rank space (the realistic shape:
    // ingest appends recent keys, not a uniform spray over the domain),
    // so bounded-scope compaction has a bounded scope to show
    def delta(k: Int, r: Range) = r.map(i =>
      (i.toLong, (k * 300 + i % 60).toLong, (k * 300 + i % 40).toLong))
    def feed(k: Int, r: Range): Unit =
      delta(k, r).toDF("id", "a", "b").repartition(1)
        .write.mode("append").parquet(srcDir)

    // store exists before the stream (init freezes the rank model)
    ClusteredStore.init(
      rows(0 until 8000).toDF("id", "a", "b"), Seq("a", "b"), 8, storeDir)

    feed(0, 8000 until 8400)
    feed(1, 8400 until 8800)
    feed(2, 8800 until 9200)

    val stats = scala.collection.mutable.ArrayBuffer
      .empty[ClusteredStore.AppendStats]
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir)
    val q = stream.writeStream.outputMode("append")
      .option("checkpointLocation", s"$base/ckpt")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        stats += ClusteredStore.appendStream(
          batch.sparkSession, storeDir, batch, id)
        ()
      }.start()
    q.processAllAvailable()
    q.stop()

    assert(stats.size === 3)
    // every batch really appended, and a localized batch must leave
    // most of the store untouched
    stats.foreach { s =>
      assert(s.created > 0, s"batch created no files: $s")
      assert(s.untouched > s.rewritten,
        s"localized batch rewrote most of the store: $s")
    }

    val want = rows(0 until 8000).toDF("id", "a", "b")
      .unionByName(delta(0, 8000 until 8400).toDF("id", "a", "b"))
      .unionByName(delta(1, 8400 until 8800).toDF("id", "a", "b"))
      .unionByName(delta(2, 8800 until 9200).toDF("id", "a", "b"))
    val got = ClusteredStore.read(spark, storeDir).select("id", "a", "b")
    assert(got.count() === 9200L)
    assert(got.exceptAll(want).count() === 0L)
    assert(want.exceptAll(got).count() === 0L)

    // crash-replay: re-deliver an already-committed batch id by hand —
    // the ledger probe must no-op (no new files, nothing rewritten)
    val replay = ClusteredStore.appendStream(
      spark, storeDir, delta(0, 8000 until 8400).toDF("id", "a", "b"),
      batchId = 0L)
    assert(replay.created === 0 && replay.rewritten === 0, s"$replay")
    assert(ClusteredStore.read(spark, storeDir).count() === 9200L,
      "replayed batch must not duplicate rows")

    // maintenance pass: the micro-batch appends traded small files for
    // bounded rewrites — compact folds them into full-size runs (new
    // manifest version, content invariant), and vacuum then reclaims
    // every file only dropped versions reference
    val before = ClusteredStore.manifest(spark, storeDir).count()
    // floor chosen between the append-born file sizes (~700 rows) and
    // the init files (1000 rows): exactly the small tail compacts
    val c = ClusteredStore.compact(spark, storeDir, minRowsPerFile = 900L)
    info(s"compact: $c")
    assert(c.rewritten >= 2, s"the small append-born files should compact: $c")
    val afterN = ClusteredStore.manifest(spark, storeDir).count()
    assert(afterN < before, s"file count must drop: $before -> $afterN")
    val gotC = ClusteredStore.read(spark, storeDir).select("id", "a", "b")
    assert(gotC.count() === 9200L)
    assert(gotC.exceptAll(want).count() === 0L)
    val reclaimed = ClusteredStore.vacuum(spark, storeDir, keepLast = 1)
    assert(reclaimed > 0)
    assert(ClusteredStore.read(spark, storeDir).count() === 9200L)
  }
}
