package graft.sink

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec
import graft.core.{LogEntry, S3Config, StorageConfig}

class StorageFactorySpec extends SparkSpec {

  private def entry(i: Int) = LogEntry(
    new Timestamp(1700000000000L + i), s"r$i", "", "", "llm_end", "{}", "{}")

  test("local-only config writes one partitioned directory " +
    "(storage.py:130-148)") {
    val dir = Files.createTempDirectory("sf1").toString
    val write = StorageFactory.create(spark, StorageConfig(logDir = dir))
    write(Seq(entry(1), entry(2)))
    assert(spark.read.parquet(dir).count() === 2L)
    assert(new java.io.File(dir).listFiles()
      .exists(_.getName.startsWith("date=")))
  }

  test("object-store config fans out to both backends with prefix " +
    "normalization") {
    val local = Files.createTempDirectory("sf2").toString
    val bucket = Files.createTempDirectory("bucket").toString
    val write = StorageFactory.create(spark, StorageConfig(
      logDir = local,
      s3 = Some(S3Config(bucket = bucket, prefix = "/logs/app/"))))
    write(Seq(entry(1)))
    assert(spark.read.parquet(local).count() === 1L)
    assert(spark.read.parquet(s"$bucket/logs/app/").count() === 1L)
  }
}
