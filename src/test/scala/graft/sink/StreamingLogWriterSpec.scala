package graft.sink

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec
import graft.core.LogEntry

class StreamingLogWriterSpec extends SparkSpec {

  private def entry(i: Int) = LogEntry(
    new Timestamp(1700000000000L + i), s"run-$i", "", s"c$i",
    "llm_end", "{}", s"""{"i":$i}""")

  test("streaming micro-batches land as date-partitioned parquet " +
    "(SURVEY §2.7)") {
    val dir = Files.createTempDirectory("slog").toString
    val ckpt = Files.createTempDirectory("sckpt").toString
    val w = new StreamingLogWriter(spark, dir, ckpt).start()
    w.log((1 to 5).map(entry): _*)
    w.processAllAvailable()
    w.log(entry(6))
    w.stop() // must drain the tail before stopping

    val df = spark.read.parquet(dir)
    assert(df.count() === 6L)
    assert(new java.io.File(dir).listFiles()
      .exists(_.getName.startsWith("date=2023-11-14")))
    assert(df.columns.toSet.contains("payload"))
  }
}
