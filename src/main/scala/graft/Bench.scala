package graft

import org.apache.spark.sql.SparkSession

import graft.queries.Registry

/** Benchmark main: runs the headline queries (Q.bench = true) on
  * SPARK_GRAFT_SF_DIR and prints one JSON line. Each query is fully
  * materialized through the noop sink (forces every column/operator,
  * unlike count() which lets Catalyst prune the plan).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val headline = Registry.all.filter(_.bench)
    // warm the JVM + file-system cache once with the cheapest query
    try headline.head.spark(spark, sfDir).write.format("noop")
      .mode("overwrite").save()
    catch { case _: Throwable => () }

    // Median of 3 runs per query: single-shot timings on a shared box
    // showed phantom 6x regressions (r2: q_asof_native recorded 7.04s,
    // idle re-run 1.08s). The median discards one bad-luck outlier while
    // keeping the reported number an actual observed run.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val results = headline.map { q =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try q.spark(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
        }
        val dt = (System.nanoTime() - t0) / 1e9
        // frames persisted inside a query (minhash signatures, tf) are
        // dead after its run — drop them so later queries get full memory
        spark.catalog.clearCache()
        dt
      }
      q.name -> times.sorted.apply(times.length / 2)
    }
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
