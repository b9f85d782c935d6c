package graft.tools

import org.apache.spark.sql.SparkSession

import graft.queries.Registry

/** Empirical scale curves: run the headline bench set at several scale
  * factors in ONE harness (same JVM, same session, warm codegen/file
  * cache) and fit each query's time-vs-rows exponent. Testdata row counts
  * scale linearly with SF, so the fitted slope of log(time) over log(SF)
  * is the growth exponent: ~1 = linear scaling, <1 = overhead- or
  * cardinality-dominated, >1.2 = superlinear (a quadratic hiding in the
  * plan).
  *
  * Reported per query: min-of-reps seconds at each SF, the exponent from
  * the largest decade (sf0.01 → sf0.1, where real work dominates fixed
  * job overhead), and a flag when it exceeds the 1.2 gate. Queries faster
  * than `floorSec` at the top SF are marked overhead-dominated — their
  * exponent is scheduling noise, not data scaling.
  *
  * Usage: runMain graft.tools.ScaleCurve [sfDir...]  (defaults to
  * /root/testdata/sf0.001 sf0.01 sf0.1)
  */
object ScaleCurve {
  def main(args: Array[String]): Unit = {
    val sfDirs =
      if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")
    require(sfDirs.length >= 2,
      s"ScaleCurve needs at least two sfDirs to fit an exponent; got $sfDirs")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val floorSec = 0.35
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
    // warm once per SF so first-query file listing doesn't bias the curve
    sfDirs.foreach { dir =>
      try headline.head.spark(spark, dir).write.format("noop")
        .mode("overwrite").save()
      catch { case _: Throwable => () }
    }

    // A rep that throws must NOT contribute its (near-zero) wall time: a
    // query broken at the large SF would otherwise record a tiny time,
    // deflate the exponent, and read as "scales great". Failed reps are
    // excluded; a query with zero successful reps at any SF fails the run.
    val failed = scala.collection.mutable.Set.empty[(String, String)]
    val times: Map[(String, String), Double] = (for {
      dir <- sfDirs
      q <- headline
    } yield {
      val ts = (1 to reps).flatMap { _ =>
        val t0 = System.nanoTime()
        val ok =
          try {
            q.spark(spark, dir).write.format("noop").mode("overwrite").save()
            true
          } catch { case e: Throwable =>
            System.err.println(s"[scale] ${q.name}@$dir failed: ${e.getMessage}")
            false
          }
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        if (ok) Some(dt) else { failed += ((q.name, dir)); None }
      }
      (q.name, dir) -> (if (ts.nonEmpty) ts.min else Double.NaN)
    }).toMap

    def sfOf(dir: String): Double =
      dir.split("sf").last.toDouble
    val (loDir, hiDir) = (sfDirs(sfDirs.length - 2), sfDirs.last)
    val decade = math.log(sfOf(hiDir) / sfOf(loDir))

    val rows = headline.map { q =>
      val tHi = times((q.name, hiDir))
      val tLo = times((q.name, loDir))
      val exp = math.log(tHi / tLo) / decade
      val overhead = tHi < floorSec
      val flag =
        if (overhead) "overhead"
        else if (exp > 1.2) "SUPERLINEAR"
        else "ok"
      (q.name, sfDirs.map(d => times((q.name, d))), exp, flag)
    }
    val qjson = rows.map { case (n, ts, e, f) =>
      "\"" + n + "\":{" +
        sfDirs.zip(ts).map { case (d, t) =>
          "\"" + d.split('/').last + f"""\":$t%.3f"""
        }.mkString(",") +
        f""","exponent":$e%.2f,"flag":"$f"}"""
    }.mkString("{", ",", "}")
    val worst = rows.filterNot(_._4 == "overhead").map(_._3).max
    println(f"""{"metric":"scale_exponent_worst","value":$worst%.2f,"unit":"exponent","queries":$qjson}""")

    val superlinear = rows.filter(_._4 == "SUPERLINEAR")
    if (superlinear.nonEmpty)
      System.err.println("SUPERLINEAR queries: " +
        superlinear.map(_._1).mkString(", "))
    if (failed.nonEmpty)
      System.err.println("queries with failed reps (times excluded): " +
        failed.toSeq.sorted.map { case (n, d) => s"$n@${d.split('/').last}" }
          .mkString(", "))
    if (superlinear.nonEmpty || failed.nonEmpty) sys.exit(1)
    spark.stop()
  }
}
