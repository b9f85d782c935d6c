package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.Fs

/** Shared spec fixture: drive the marker-committed purge protocol by
  * hand to its COMMIT POINT and stop — the exact on-disk state a crash
  * leaves (replacement staged under the dot-dir, `_PURGE` marker
  * present, old files untouched) — so suites can assert gate exactness
  * mid-crash and heal convergence afterwards.
  */
object PurgeFixtures {

  /** Fabricate a crashed committed-rewrite of one partition (or a flat
    * store root via empty `partDirName`): `replacement` maps the
    * pinned old-file read to the staged content.
    */
  def fabricateCrashedRewrite(spark: SparkSession, dataDir: String,
      partDirName: String,
      replacement: DataFrame => DataFrame): Unit = {
    val pDir =
      if (partDirName.isEmpty) dataDir else s"$dataDir/$partDirName"
    val old = Fs.list(spark, pDir)
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith("."))
      .map(_.getPath)
    require(old.nonEmpty, "fixture partition has no data files")
    val token = java.util.UUID.randomUUID.toString
    val stagePDir =
      if (partDirName.isEmpty) s"$dataDir/.purge.$token"
      else s"$dataDir/.purge.$token/$partDirName"
    replacement(spark.read.parquet(old.map(_.toString): _*))
      .write.mode("overwrite").parquet(stagePDir)
    val fs = Fs(spark, dataDir)
    val marker = new Path(dataDir, s"_PURGE.$token.$partDirName")
    val out = fs.create(marker, false)
    try out.write(old.map(_.getName).mkString("\n").getBytes("UTF-8"))
    finally out.close()
  }
}
