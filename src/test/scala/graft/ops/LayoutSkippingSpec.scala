package graft.ops

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Physical-layout data skipping: parquet keeps min/max stats per row
  * group, so a table SORTED by its filter key lets the reader skip whole
  * row groups — measured here by the scan's actual output-row metric, not
  * inferred from the plan. At 100 TB "sort the table by the hot filter
  * key" is regularly a 10–100× I/O cut; this spec proves the engine's
  * read path actually exploits it.
  */
class LayoutSkippingSpec extends SparkSpec {

  private def scanRows(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scans = plan.collect { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty, "no file scan in plan")
    scans.map(_.metrics("numOutputRows").value).sum
  }

  test("a table sorted by the filter key reads fewer rows than the same " +
    "table unsorted (row-group stats pruning)") {
    val ev = graft.queries.tbl(spark, sf("sf0.01"), "events")
      .select("event_id", "user_id", "value")
    val base = java.nio.file.Files.createTempDirectory("layout").toString
    // small row groups so sf0.01 spans many of them
    ev.coalesce(1).write.option("parquet.block.size", 64 * 1024)
      .mode("overwrite").parquet(s"$base/unsorted")
    ev.coalesce(1).sortWithinPartitions("user_id")
      .write.option("parquet.block.size", 64 * 1024)
      .mode("overwrite").parquet(s"$base/sorted")

    def filtered(path: String) =
      spark.read.parquet(path).filter(col("user_id") === 42)

    val resultRows = filtered(s"$base/sorted").count()
    assert(resultRows === filtered(s"$base/unsorted").count())
    assert(resultRows > 0, "filter key missing from fixture — weak test")

    val sortedScan = scanRows(filtered(s"$base/sorted"))
    val unsortedScan = scanRows(filtered(s"$base/unsorted"))
    info(s"scan output rows: sorted=$sortedScan unsorted=$unsortedScan " +
      s"(result=$resultRows)")
    // unsorted: the key is spread over ~every row group, stats prune
    // nothing; sorted: only the row group(s) holding user_id=42 decode
    assert(sortedScan < unsortedScan,
      s"sorted layout did not skip row groups: $sortedScan vs $unsortedScan")
  }
}
