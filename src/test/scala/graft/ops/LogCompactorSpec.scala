package graft.ops

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec
import graft.core.LogEntry
import graft.sink.ParquetDirSink

class LogCompactorSpec extends SparkSpec {

  test("many flush files collapse to the target count with data intact") {
    val dir = Files.createTempDirectory("compact").toString
    val sink = new ParquetDirSink(spark, dir)
    // 10 separate flushes → 10 files in one date partition
    (1 to 10).foreach { b =>
      sink.write((1 to 20).map(i => LogEntry(
        new Timestamp(1700000000000L), s"r$b-$i", "", "", "llm_end",
        "{}", s"""{"b":$b,"i":$i}""")))
    }
    val part = new java.io.File(s"$dir/date=2023-11-14")
    // each flush writes one file per task (local[4]) → 40 small files
    val before = part.listFiles().count(_.getName.endsWith(".parquet"))
    assert(before === 40)
    val pre = spark.read.parquet(dir).orderBy("run_id").collect()

    val reports = LogCompactor.compact(spark, dir, targetFileBytes = 1L << 30)
    assert(reports.map(_.filesBefore).sum === 40)
    val after = part.listFiles().count(_.getName.endsWith(".parquet"))
    assert(after === 1)
    val post = spark.read.parquet(dir).orderBy("run_id").collect()
    assert(post.toSeq === pre.toSeq) // byte-for-byte same rows
  }
}
