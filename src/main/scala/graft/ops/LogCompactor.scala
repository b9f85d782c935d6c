package graft.ops

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction for buffered log directories.
  *
  * A count-triggered sink (reference flush behavior) produces one parquet
  * file per flush — at scale, millions of small files destroy scan
  * performance (per-file open cost dominates). Compaction rewrites each
  * date partition into ⌈bytes / targetFileBytes⌉ files while preserving
  * the data exactly. Runs per-partition so it can be applied
  * incrementally to closed (past-date) partitions only.
  */
object LogCompactor {

  final case class CompactionReport(
      partition: String, filesBefore: Int, filesAfter: Int, bytes: Long)

  /** Compact the given `date=` partitions (default: all). */
  def compact(
      spark: SparkSession,
      dir: String,
      targetFileBytes: Long = 128L * 1024 * 1024,
      partitions: Option[Seq[String]] = None): Seq[CompactionReport] = {
    val root = new java.io.File(dir)
    val parts = root.listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("date="))
      .filter(f => partitions.forall(_.contains(f.getName)))

    parts.map { p =>
      val files = p.listFiles().filter(_.getName.endsWith(".parquet"))
      val bytes = files.map(_.length()).sum
      val target = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
      val report = CompactionReport(p.getName, files.length, target, bytes)
      if (files.length > target) {
        val df = spark.read.parquet(p.getAbsolutePath)
        val tmp = p.getAbsolutePath + ".compact"
        df.coalesce(target).write.mode(SaveMode.Overwrite)
          .option("compression", "snappy").parquet(tmp)
        // atomic-ish swap: rewrite into place from the compacted copy
        val compacted = spark.read.parquet(tmp)
        compacted.coalesce(target).write.mode(SaveMode.Overwrite)
          .option("compression", "snappy").parquet(p.getAbsolutePath)
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
      }
      report
    }
  }
}
