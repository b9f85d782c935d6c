package graft.tools

import org.apache.spark.sql.SparkSession

import graft.queries.Registry

/** Time specific registry queries at one SF — the targeted companion to
  * Bench (whole headline set) and ScaleCurve (all SFs): after a scale or
  * guard change, re-measure exactly the affected queries without paying
  * for a full sweep. Prints one JSON line of min-of-reps seconds.
  *
  * Usage: runMain graft.tools.TimeQueries <sfDir> <name> [name...]
  * (SPARK_GRAFT_BENCH_REPS, default 2)
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: TimeQueries <sfDir> <name> [name...]")
    val sfDir = args.head
    val names = args.drop(1).toSet
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = Registry.all.filter(q => names.contains(q.name))
    val times = qs.map { q =>
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        q.spark(spark, sfDir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      q.name -> ts.min
    }
    println(times.map { case (n, t) => "\"" + n + f"""\":$t%.3f""" }
      .mkString(s"""{"metric":"time_queries","sf":"$sfDir",""", ",", "}"))
    spark.stop()
  }
}
