package graft.tools

import org.apache.spark.sql.SparkSession

import graft.queries.Registry

/** Standing partition-count-invariance gate: the full oracle query set
  * must produce BIT-IDENTICAL results (values AND row order) at different
  * `spark.sql.shuffle.partitions` settings. A divergence means a query's
  * answer depends on physical partitioning — an order-dependent aggregate
  * (e.g. float summation without the exact-decimal cast), a window over a
  * non-total order, or a `first`/`collect_list` without a sort — exactly
  * the class of bug a fixed local[32] run can never surface but a
  * 1000-executor cluster hits immediately.
  *
  * Row ORDER is part of the contract on purpose: every registry query ends
  * in a total ORDER BY (package.scala rule), and the driver's oracle hash
  * is order-sensitive, so an order flap IS a failure.
  *
  * Usage: runMain graft.tools.PartitionInvariance [sfDir [count1 count2 ...]]
  * (defaults: /root/testdata/sf0.01 at 5 and 32 shuffle partitions — a
  * prime-ish low count reshapes every hash exchange vs the standard 32).
  * Exits non-zero on any divergence or query error.
  */
object PartitionInvariance {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val counts =
      if (args.length > 1) args.drop(1).toSeq.map(_.toInt) else Seq(5, 32)
    require(counts.length >= 2, "need at least two partition counts")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", counts.head.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.ensureRegistered(spark)

    val errors = scala.collection.mutable.ArrayBuffer.empty[String]

    /** Canonical digest of a result: schema + every row in result order. */
    def digest(q: graft.queries.Q): String =
      try {
        val df = q.spark(spark, sfDir)
        val md = java.security.MessageDigest.getInstance("MD5")
        md.update(df.schema.map(f => s"${f.name}:${f.dataType.sql}")
          .mkString(";").getBytes("UTF-8"))
        df.collect().foreach(r => md.update(r.toString.getBytes("UTF-8")))
        md.digest().map(b => f"$b%02x").mkString
      } catch {
        case e: Throwable =>
          errors += s"${q.name}: ${e.getMessage}"
          s"ERROR:${e.getClass.getName}"
      } finally spark.catalog.clearCache()

    val perCount: Seq[(Int, Map[String, String])] = counts.map { n =>
      spark.conf.set("spark.sql.shuffle.partitions", n.toString)
      // vary the INPUT partitioning with the shuffle count: tiny file
      // splits at the low count force many map partitions, catching
      // order-dependence fed by scan partitioning (not just exchanges)
      spark.conf.set("spark.sql.files.maxPartitionBytes",
        if (n == counts.min) (512 * 1024).toString else (128 * 1024 * 1024).toString)
      n -> Registry.all.map(q => q.name -> digest(q)).toMap
    }
    val base = perCount.head
    val diverged = Registry.all.map(_.name).filter { name =>
      perCount.exists(_._2(name) != base._2(name))
    }

    diverged.foreach { name =>
      System.err.println(s"DIVERGENT $name: " + perCount.map {
        case (n, m) => s"partitions=$n -> ${m(name)}"
      }.mkString(", "))
    }
    errors.foreach(e => System.err.println(s"ERROR $e"))
    val nq = Registry.all.length
    println(s"""{"metric":"partition_invariance","queries":$nq,""" +
      s""""counts":[${counts.mkString(",")}],"divergent":${diverged.length},""" +
      s""""errors":${errors.length},"sf":"$sfDir"}""")
    if (diverged.nonEmpty || errors.nonEmpty) sys.exit(1)
    spark.stop()
  }
}
