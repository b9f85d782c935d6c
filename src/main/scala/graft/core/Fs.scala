package graft.core

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Filesystem access for persistent-store operators, routed through the
  * Hadoop FileSystem API so every path-keyed store (span-dedup ledgers,
  * retrieval checkpoints, log directories, index partitions) behaves
  * identically on local disk, HDFS, and object stores (`s3a://`,
  * `gs://`, `abfs://`). A bare `java.io.File` probe of an `s3a://` URI
  * silently answers "doesn't exist", which flips append-mode writers
  * into overwrite mode and discards state — so operator code must never
  * touch `java.io.File` for data paths. [[graft.ops.MergeStore.merge]]
  * was the original correct pattern; this object is that pattern shared.
  *
  * Rename caveat: `FileSystem.rename` is atomic on HDFS and local disk
  * but a copy-then-delete on S3-family stores; stage-then-rename callers
  * therefore get all-or-nothing visibility PER FILE (readers list the
  * destination, and part-file names are unique), not atomic directory
  * swaps — the same contract Spark's own FileOutputCommitter lives with.
  */
object Fs {

  def apply(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists(spark: SparkSession, path: String): Boolean =
    apply(spark, path).exists(new Path(path))

  /** Directory exists and has at least one child — the "was this store
    * ever written" probe (a bare exists() is true for the empty dir a
    * failed first write can leave behind).
    */
  def nonEmptyDir(spark: SparkSession, path: String): Boolean = {
    val fs = apply(spark, path)
    val p = new Path(path)
    fs.exists(p) && fs.listStatus(p).nonEmpty
  }

  /** Immediate children of `path`; empty when the path is missing. */
  def list(spark: SparkSession, path: String): Seq[FileStatus] = {
    val fs = apply(spark, path)
    val p = new Path(path)
    if (fs.exists(p)) fs.listStatus(p).toSeq else Seq.empty
  }

  /** Recursive delete; quiet no-op when the path is missing. */
  def delete(spark: SparkSession, path: String): Unit = {
    apply(spark, path).delete(new Path(path), true)
    ()
  }

  /** Concurrency-safe append of `df` into `destDir`: stage-write to a
    * unique sibling directory, then move the data files into `destDir`
    * (preserving `c=v` partition subdirs when `partCol` is set) with
    * per-file renames. Two concurrent `df.write.mode("append")` calls on
    * one directory share `destDir/_temporary` and can delete each
    * other's in-flight task output; unique staging dirs remove the
    * shared mutable path entirely, and Spark's UUID part-file names
    * guarantee no rename collision — so interleaved appenders commute
    * and none is lost. First write creates the destination. Extracted
    * from the BM25 index append path so every append-mode store (tile
    * ledgers, posting deltas) shares the one proven idiom.
    *
    * Returns the qualified destination paths of the files THIS CALL
    * moved — the caller's explicit commit lineage. A manifest-keeping
    * store ([[graft.ops.ClusteredStore]]) must register exactly these
    * paths, never "whatever is in the directory that nothing references
    * yet": a crashed earlier attempt can leave orphan data files that an
    * infer-by-difference commit would adopt alongside its own staged
    * copies, silently doubling the rewritten rows.
    */
  def stagedAppend(
      df: org.apache.spark.sql.DataFrame,
      partCol: Option[String],
      destDir: String): Seq[String] = {
    val spark = df.sparkSession
    val parent = new Path(destDir).getParent
    val staging =
      new Path(parent, s".staging-${java.util.UUID.randomUUID}").toString
    val w = df.write.mode("overwrite")
    partCol.fold(w)(w.partitionBy(_)).parquet(staging)
    val moved = moveDataFiles(spark, staging, destDir)
    delete(spark, staging)
    moved
  }

  /** Every DATA file under `dir`, recursively, skipping `_`/`.`-prefixed
    * files and anything inside a `_`/`.`-prefixed directory — the same
    * visibility rule Spark's own file listing applies, so this is "what
    * a directory-scan reader would read". Qualified paths; empty when
    * the directory is missing.
    */
  def listDataFiles(spark: SparkSession, dir: String): Seq[String] = {
    val fs = apply(spark, dir)
    val root = fs.makeQualified(new Path(dir))
    if (!fs.exists(root)) return Seq.empty
    val it = fs.listFiles(root, true)
    val out = Seq.newBuilder[String]
    while (it.hasNext) {
      val st = it.next()
      val name = st.getPath.getName
      val rel = root.toUri.relativize(st.getPath.toUri).getPath
      val inHiddenDir = rel.split('/').init
        .exists(d => d.startsWith("_") || d.startsWith("."))
      if (!name.startsWith("_") && !name.startsWith(".") && !inHiddenDir)
        out += st.getPath.toString
    }
    out.result()
  }

  /** Move every DATA file under `srcDir` into `destDir`, preserving
    * relative subpaths (hive `c=v` partition dirs); `_SUCCESS`,
    * `_temporary` and dot-files are skipped. Each file lands via one
    * `rename`, so a reader listing `destDir` sees whole files only.
    * Returns the qualified destination path of every moved file.
    */
  def moveDataFiles(
      spark: SparkSession, srcDir: String, destDir: String): Seq[String] = {
    val fs = apply(spark, srcDir)
    val src = fs.makeQualified(new Path(srcDir))
    val dest = fs.makeQualified(new Path(destDir))
    val it = fs.listFiles(src, true)
    val moved = Seq.newBuilder[String]
    while (it.hasNext) {
      val st = it.next()
      val name = st.getPath.getName
      val rel = src.toUri.relativize(st.getPath.toUri).getPath
      val inHiddenDir = rel.split('/').init
        .exists(d => d.startsWith("_") || d.startsWith("."))
      if (!name.startsWith("_") && !name.startsWith(".") && !inHiddenDir) {
        val target = new Path(dest, rel)
        fs.mkdirs(target.getParent)
        fs.rename(st.getPath, target)
        moved += target.toString
      }
    }
    moved.result()
  }
}
