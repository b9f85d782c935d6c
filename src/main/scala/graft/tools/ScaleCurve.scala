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
  * the largest decade (where real work dominates fixed job overhead), an
  * OLS `fit` of log(time) on log(SF) over every above-floor point (the
  * multi-decade trend — meaningful with the synthesized sf1 leg giving
  * four points over three decades), and a flag when the 1.2 gate trips.
  * The SUPERLINEAR flag requires BOTH estimates over 1.2 when the fit is
  * available: the last-decade ratio alone is one noisy division, and a
  * single slow rep at the top SF should not fail the run when the full
  * curve is linear. Queries faster than `floorSec` at the top SF are
  * marked overhead-dominated — their exponent is scheduling noise, not
  * data scaling.
  *
  * Usage: runMain graft.tools.ScaleCurve [sfDir...]  (defaults to
  * /root/testdata/sf0.001 sf0.01 sf0.1; pass
  * /root/repo/testdata_synth/sf1 as a fourth leg after running
  * graft.tools.Synth)
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

    // OLS slope of log(time) on log(SF) over EVERY point whose time
    // clears the overhead floor: the multi-decade growth trend, robust
    // to single-point noise in a way the last-decade ratio is not. With
    // 4 scale points this is a real regression; fewer than 2 clear
    // points → NaN (reported as the last-decade exponent alone).
    def olsExponent(pts: Seq[(Double, Double)]): Double = {
      if (pts.length < 2) Double.NaN
      else {
        val xs = pts.map(p => math.log(p._1))
        val ys = pts.map(p => math.log(p._2))
        val (mx, my) = (xs.sum / xs.length, ys.sum / ys.length)
        val sxy = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
        val sxx = xs.map(x => (x - mx) * (x - mx)).sum
        sxy / sxx
      }
    }

    // Engine-normalized metric for the pair-emitting dedup legs (r10
    // verdict item 7): their raw exponents are dominated by corpus-
    // constructed candidate growth (near-dup clusters grow with SF), so
    // a true ENGINE regression could hide inside them. Dividing wall
    // time by the exact candidate-pair count (PairStats — the legs'
    // true work unit) yields ns/pair per decade; a decade where the
    // per-pair cost RISES sharply while the raw time is above the noise
    // floor is an engine regression regardless of what the corpus did.
    val pairLegOf = Map(
      "q_dedup_minhash" -> "minhash",
      "q_dedup_simhash60" -> "simhash60",
      "q_dedup_embedding_lsh" -> "embedding_lsh")
    val needPairs = headline.map(_.name).exists(pairLegOf.contains)
    val pairsBySf: Map[String, Map[String, Long]] =
      if (!needPairs) Map.empty
      else sfDirs.map(d => d -> PairStats.candidatePairs(spark, d)).toMap

    val rows = headline.map { q =>
      val tHi = times((q.name, hiDir))
      val tLo = times((q.name, loDir))
      val exp = math.log(tHi / tLo) / decade
      val fitPts = sfDirs
        .map(d => (sfOf(d), times((q.name, d))))
        .filter { case (_, t) => !t.isNaN && t >= floorSec }
      val fit = olsExponent(fitPts)
      val overhead = tHi < floorSec
      // ns/candidate-pair per decade (pair legs only; NaN elsewhere)
      val nsPerPair: Seq[Double] = pairLegOf.get(q.name) match {
        case Some(leg) => sfDirs.map { d =>
          val pairs = pairsBySf.getOrElse(d, Map.empty).getOrElse(leg, 0L)
          if (pairs > 0) times((q.name, d)) * 1e9 / pairs else Double.NaN
        }
        case None => Seq.empty
      }
      // engine-regression gate: per-pair cost at the top decade rose
      // >1.5x over the previous decade, with the top time above floor
      val engineRegressed = nsPerPair.length >= 2 && !overhead && {
        val top = nsPerPair.last
        val prev = nsPerPair(nsPerPair.length - 2)
        !top.isNaN && !prev.isNaN && top > 1.5 * prev
      }
      // the benign corpus-pairs downgrade requires the engine-normalized
      // EVIDENCE to exist: a pair leg whose top-decade ns/pair is NaN
      // (candidate-pair count 0, or the leg skipped) has nothing to
      // attribute its superlinear growth to, so it falls back to the
      // failing SUPERLINEAR gate instead of being silently excused
      // (r11 advice)
      val pairEvidence = nsPerPair.nonEmpty && !nsPerPair.last.isNaN
      val flag =
        if (overhead) "overhead"
        else if (engineRegressed) "NS_PER_PAIR_RISING"
        else if (exp > 1.2 && pairEvidence) "corpus-pairs"
        else if (exp > 1.2 && (fit.isNaN || fit > 1.2)) "SUPERLINEAR"
        else "ok"
      (q.name, sfDirs.map(d => times((q.name, d))), exp, fit, flag,
        nsPerPair)
    }
    val qjson = rows.map { case (n, ts, e, fit, f, npp) =>
      "\"" + n + "\":{" +
        sfDirs.zip(ts).map { case (d, t) =>
          "\"" + d.split('/').last + f"""\":$t%.3f"""
        }.mkString(",") +
        f""","exponent":$e%.2f,""" +
        (if (fit.isNaN) "" else f""""fit":$fit%.2f,""") +
        (if (npp.isEmpty) ""
         else {
           val legName = pairLegOf(n)
           val pj = sfDirs.map(d =>
             "\"" + d.split('/').last + "\":" +
               pairsBySf.getOrElse(d, Map.empty).getOrElse(legName, 0L))
             .mkString(",")
           val nj = sfDirs.zip(npp).map { case (d, v) =>
             "\"" + d.split('/').last +
               (if (v.isNaN) "\":null" else f"""\":$v%.1f""")
           }.mkString(",")
           s""""pairs":{$pj},"ns_per_pair":{$nj},"""
         }) +
        f""""flag":"$f"}"""
    }.mkString("{", ",", "}")
    val worst = rows.filterNot(_._5 == "overhead").map(_._3).max
    println(f"""{"metric":"scale_exponent_worst","value":$worst%.2f,"unit":"exponent","queries":$qjson}""")

    val superlinear = rows.filter(r =>
      r._5 == "SUPERLINEAR" || r._5 == "NS_PER_PAIR_RISING")
    if (superlinear.nonEmpty)
      System.err.println("SUPERLINEAR / engine-regressed queries: " +
        superlinear.map(r => s"${r._1}(${r._5})").mkString(", "))
    if (failed.nonEmpty)
      System.err.println("queries with failed reps (times excluded): " +
        failed.toSeq.sorted.map { case (n, d) => s"$n@${d.split('/').last}" }
          .mkString(", "))
    if (superlinear.nonEmpty || failed.nonEmpty) sys.exit(1)
    spark.stop()
  }
}
