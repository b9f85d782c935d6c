package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Exactly-once-per-batch parquet sink for `foreachBatch`.
  *
  * Structured Streaming guarantees at-least-once delivery to
  * `foreachBatch`: after a crash between the sink write and the
  * checkpoint commit, the SAME batchId is re-delivered. Idempotence must
  * come from the sink — here, each micro-batch lands in its own
  * `batch=<id>` directory and gains a `_COMMITTED` marker only after the
  * write completes. A re-delivered batchId sees the marker and skips
  * (the overwrite mode also clears any partial files from the crashed
  * attempt before the marker existed). Readers take only committed
  * directories, so a half-written batch is never visible.
  *
  * This is the classic transactional-sink recipe for stores without
  * atomic multi-file commit; at 100 TB/day the unit of retry stays one
  * micro-batch, and compaction of committed batch dirs is
  * [[graft.ops.LogCompactor]]'s job.
  */
object IdempotentSink {

  /** Write one micro-batch if (and only if) its id has not committed.
    * Returns true when this call did the write, false on replay-skip.
    */
  def writeBatch(batch: DataFrame, path: String, batchId: Long): Boolean = {
    val spark = batch.sparkSession
    val dir = new Path(s"$path/batch=$batchId")
    val marker = new Path(dir, "_COMMITTED")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(marker)) false
    else {
      batch.write.mode("overwrite").parquet(dir.toString)
      fs.create(marker, true).close()
      true
    }
  }

  def start(
      stream: DataFrame, path: String, checkpoint: String): StreamingQuery =
    stream.writeStream
      .foreachBatch((b: DataFrame, id: Long) => { writeBatch(b, path, id); () })
      .option("checkpointLocation", checkpoint)
      .start()

  /** Union of the COMMITTED batches only.
    *
    * `schema` keeps an empty-but-valid sink queryable: with no committed
    * batch yet, a schemaless `emptyDataFrame` would make downstream column
    * references (`filter($"event_type" === ...)`) throw AnalysisException
    * even though the same pipeline works once one batch lands. When no
    * schema is given and nothing has committed, we fall back to any
    * not-yet-committed files' schema before resorting to the zero-column
    * frame.
    */
  def readCommitted(
      spark: SparkSession,
      path: String,
      schema: Option[org.apache.spark.sql.types.StructType] = None)
      : DataFrame = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs =
      if (!fs.exists(root)) Array.empty[org.apache.hadoop.fs.FileStatus]
      else fs.listStatus(root).filter(_.isDirectory)
    val committed = dirs
      .filter(s => fs.exists(new Path(s.getPath, "_COMMITTED")))
      .map(_.getPath.toString)
    if (committed.nonEmpty)
      spark.read.parquet(committed.toIndexedSeq: _*)
    else schema match {
      case Some(st) =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], st)
      case None =>
        // Uncommitted (in-flight) batch dirs still reveal the shape of the
        // data; only a truly virgin sink degrades to zero columns.
        val anyFiles = dirs.map(_.getPath.toString)
        if (anyFiles.nonEmpty)
          scala.util.Try {
            val st = spark.read.parquet(anyFiles.toIndexedSeq: _*).schema
            spark.createDataFrame(
              spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], st)
          }.getOrElse(spark.emptyDataFrame)
        else spark.emptyDataFrame
    }
  }
}
