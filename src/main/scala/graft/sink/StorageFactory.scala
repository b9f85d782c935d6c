package graft.sink

import org.apache.spark.sql.SparkSession

import graft.core.{LogEntry, StorageConfig}

/** S4: config-driven sink selection (reference `create_storage`,
  * storage.py:130-148): always the local/primary parquet directory, plus a
  * retrying secondary when an object-store target is configured. In
  * production the secondary URI is `s3a://bucket/prefix` via hadoop-aws;
  * here any second directory URI exercises the same code path.
  */
object StorageFactory {

  def create(spark: SparkSession, cfg: StorageConfig): Seq[LogEntry] => Unit = {
    val partitioned = cfg.partitionOn.contains("date")
    val local: Seq[LogEntry] => Unit =
      new ParquetDirSink(spark, cfg.logDir, partitioned).write
    cfg.s3 match {
      case Some(s3) =>
        val remoteDir = s"${s3.bucket.stripSuffix("/")}/${s3.normalizedPrefix}"
        val remote = new ParquetDirSink(spark, remoteDir, partitioned)
        val retrying = new RetryingStorage(remote.write,
          s3.retryAttempts, s3.onFailure)
        new CompositeStorage(Seq(local, retrying.apply)).apply
      case None => local
    }
  }
}
