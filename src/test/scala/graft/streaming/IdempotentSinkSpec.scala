package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.streaming.EventAnalytics.Ev

class IdempotentSinkSpec extends SparkSpec {

  private def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)

  test("re-delivered batchId is skipped — no duplicates, data unchanged") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("idem").toString
    val b0 = Seq(Ev(1, ts(0), "click", 1.0), Ev(2, ts(1), "view", 2.0)).toDF()
    assert(IdempotentSink.writeBatch(b0, dir, 0L) === true)
    // crash-replay: same id arrives again, even with different content
    val replay = Seq(Ev(9, ts(9), "poison", 9.0)).toDF()
    assert(IdempotentSink.writeBatch(replay, dir, 0L) === false)
    val read = IdempotentSink.readCommitted(spark, dir)
    assert(read.count() === 2L)
    assert(read.filter($"event_type" === "poison").count() === 0L)
  }

  test("uncommitted (crashed) batch directories are invisible to readers") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("idem2").toString
    assert(IdempotentSink.writeBatch(
      Seq(Ev(1, ts(0), "click", 1.0)).toDF(), dir, 0L))
    // simulate a crash mid-batch-1: files exist, no marker
    Seq(Ev(2, ts(1), "view", 2.0)).toDF()
      .write.parquet(s"$dir/batch=1")
    assert(IdempotentSink.readCommitted(spark, dir).count() === 1L)
    // the re-delivery completes batch 1 and it becomes visible
    assert(IdempotentSink.writeBatch(
      Seq(Ev(2, ts(1), "view", 2.0)).toDF(), dir, 1L))
    assert(IdempotentSink.readCommitted(spark, dir).count() === 2L)
  }

  test("end-to-end: streaming query lands each micro-batch exactly once") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("idem3").toString
    val ckpt = java.nio.file.Files.createTempDirectory("idem3ck").toString
    val stream = MemoryStream(
      implicitly[org.apache.spark.sql.Encoder[Ev]], spark)
    val q = IdempotentSink.start(stream.toDF(), dir, ckpt)
    try {
      stream.addData(Ev(1, ts(0), "click", 1.0), Ev(2, ts(1), "view", 2.0))
      q.processAllAvailable()
      stream.addData(Ev(3, ts(2), "click", 3.0))
      q.processAllAvailable()
      assert(IdempotentSink.readCommitted(spark, dir).count() === 3L)
    } finally q.stop()
  }
}
