package graft.sink

import java.util.concurrent.atomic.AtomicLong

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.LogEntry

/** Where normalized [[LogEntry]] rows go. Implementations must be
  * thread-safe: any number of callback threads converge on `append`
  * (reference logger.py:417-423).
  */
trait LogSink extends AutoCloseable {
  def append(entry: LogEntry): Unit
  def flush(): Unit
  override def close(): Unit = flush()
}

/** Count-triggered buffered sink (S7→S1): rows accumulate in memory and
  * flush as one columnar batch when `bufferSize` is reached, on explicit
  * `flush()`, on `close()`, and via a JVM shutdown hook (the reference's
  * atexit, logger.py:85). The buffer swap happens under the lock; the
  * write happens outside it, so callback threads are never blocked on I/O
  * (fixing the reference quirk noted in SURVEY §2.7).
  */
final class BufferedSink(downstream: Seq[LogEntry] => Unit, bufferSize: Int = 100)
    extends LogSink {

  private val buf = new ArrayBuffer[LogEntry](bufferSize)
  private val lock = new Object

  private val shutdownHook = new Thread(() =>
    try flush() catch { case _: Throwable => () })
  Runtime.getRuntime.addShutdownHook(shutdownHook)

  override def append(entry: LogEntry): Unit = {
    var toWrite: Seq[LogEntry] = null
    lock.synchronized {
      buf += entry
      if (buf.size >= bufferSize) toWrite = swapLocked()
    }
    if (toWrite != null) downstream(toWrite)
  }

  override def flush(): Unit = {
    val toWrite = lock.synchronized(swapLocked())
    if (toWrite.nonEmpty) downstream(toWrite)
  }

  private def swapLocked(): Seq[LogEntry] = {
    val out = buf.toVector
    buf.clear()
    out
  }

  override def close(): Unit = {
    flush()
    try Runtime.getRuntime.removeShutdownHook(shutdownHook)
    catch { case _: IllegalStateException => () } // already shutting down
  }
}

/** Hive-style date-partitioned snappy-Parquet writer (S1, §1.6).
  *
  * Unlike the reference — where `date=` is a path string derived from wall
  * clock at flush time (logger.py:465-470) — the partition value is a real
  * `to_date(timestamp)` column, so partition pruning works on the read
  * side (`PruneFileSourcePartitions` fires on `WHERE date = ...`).
  *
  * `hourGrain` adds a second partition key (`date=.../hour=N/`) for
  * high-volume deployments: at 100 TB/day a single date partition is
  * terabytes, so intraday dashboards ("last 2 hours") would scan a full
  * day; with the hour key both predicates land in the scan's
  * PartitionFilters and the read is 1/24th the I/O. Readers that filter
  * on `date` alone still prune — hive layouts prune on any prefix of the
  * key list.
  */
final class ParquetDirSink(
    spark: SparkSession,
    dir: String,
    partitionOnDate: Boolean = true,
    compression: String = "snappy",
    hourGrain: Boolean = false)
    extends Serializable {

  def write(entries: Seq[LogEntry]): Unit = {
    if (entries.isEmpty) return
    import spark.implicits._
    writeDataset(spark.createDataset(entries).toDF())
  }

  /** Distributed variant: land an already-distributed Dataset of entries
    * without routing rows through the driver.
    */
  def writeDataset(df: org.apache.spark.sql.DataFrame): Unit = {
    val writer = (if (partitionOnDate && hourGrain) {
      df.withColumn("date", to_date(col("timestamp")))
        .withColumn("hour", hour(col("timestamp")))
        .write.partitionBy("date", "hour")
    } else if (partitionOnDate) {
      df.withColumn("date", to_date(col("timestamp")))
        .write.partitionBy("date")
    } else df.write)
      .mode(SaveMode.Append)
      .option("compression", compression)
    writer.parquet(dir)
  }
}

/** Storage backend abstraction with retry semantics (S2–S4): the reference
  * retries S3 puts with exponential backoff and supports `error` vs
  * `continue` failure modes (storage.py:70-101). Cloud object stores are
  * out of scope in this environment, so the backend is pluggable and the
  * retry/failure-mode logic is exercised against injectable writers.
  */
final class RetryingStorage(
    write: Seq[LogEntry] => Unit,
    retryAttempts: Int = 3,
    onFailure: String = "error", // "error" | "continue"
    sleep: Long => Unit = Thread.sleep) {

  val failures = new AtomicLong(0)

  def apply(entries: Seq[LogEntry]): Unit = {
    var attempt = 0
    var done = false
    while (!done) {
      try { write(entries); done = true }
      catch {
        case e: Throwable =>
          attempt += 1
          if (attempt >= retryAttempts) {
            failures.incrementAndGet()
            if (onFailure == "error") throw e
            done = true // continue mode: swallow after final attempt
          } else sleep(1000L * (1L << attempt)) // 2^attempt seconds
      }
    }
  }
}

/** Composite sink: write every batch to all backends (S3 composite,
  * storage.py:113-127).
  */
final class CompositeStorage(backends: Seq[Seq[LogEntry] => Unit]) {
  def apply(entries: Seq[LogEntry]): Unit = backends.foreach(_(entries))
}
