package graft.tools

import org.apache.spark.sql.SparkSession

import graft.queries.Registry

/** Plan-audit helper: print the formatted physical plan for the given
  * queries (default: headline bench set; `--all` = every registry query,
  * the PLANS.md regeneration mode) so pushdown / broadcast / codegen can
  * be inspected. Usage: runMain graft.tools.Explain [sfDir] [--all|names...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val everything = args.drop(1).contains("--all")
    val names =
      if (args.length > 1 && !everything) args.drop(1).toSet
      else Set.empty[String]
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Registry.all
      .filter(q => everything ||
        (if (names.nonEmpty) names.contains(q.name) else q.bench))
      .foreach { q =>
        println(s"\n========== ${q.name} ==========")
        try q.spark(spark, sfDir).explain("formatted")
        catch { case e: Throwable => println(s"explain failed: $e") }
      }
    spark.stop()
  }
}
