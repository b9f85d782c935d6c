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

    // SPARK_GRAFT_BENCH_ONLY=q_a,q_b narrows the headline set — a
    // local iteration aid (tune one query without paying the full
    // sweep); the driver never sets it, so recorded artifacts are
    // always the full set.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val headline = Registry.all.filter(_.bench)
      .filter(q => only.forall(_.contains(q.name)))
    // Untimed fixture pass over EVERY headline query: memoized layouts
    // (clustered stores, z-order dirs + their ledgers) are built by the
    // first run in the process, and timing that run as rep 1 made the
    // spread column measure fixture construction, not the query
    // (r9: q_cluster_append spread 21.7×, q_hilbert_prune 7.3× — the
    // min was fine, the spread was the fixture). One untimed sweep
    // builds every fixture and warms codegen + the fs cache; the timed
    // reps below then all measure the serving path. Errors are ignored
    // here — the timed reps record them properly.
    headline.foreach { q =>
      try q.spark(spark, sfDir).write.format("noop")
        .mode("overwrite").save()
      catch { case _: Throwable => () }
      spark.catalog.clearCache()
    }

    // MIN of N runs per query: two consecutive rounds recorded phantom
    // contention regressions on the shared box (r2: q_asof_native 7.04s
    // recorded vs 1.08s idle; r3: q_bloom_prejoin 7.71s vs 0.79s idle —
    // THROUGH a median-of-3, i.e. the window had sustained contention).
    // The minimum is still an actually-observed complete run and is the
    // standard contention-robust statistic: external interference only
    // ever ADDS time, so min converges on the machine-limited cost.
    // Per-query spread (max/min of the reps) is emitted alongside so a
    // poisoned window is self-evident in the artifact itself.
    //
    // Reps are INTERLEAVED rep-major (rep 1 of every query, then rep 2 of
    // every query, ...): with consecutive per-query reps, a sustained
    // contention burst poisoned every rep of whichever query it landed on
    // (r4: q_bloom_prejoin all-5-reps 1.79s vs 0.72s idle). Rep-major, the
    // same burst costs one rep of many queries and each query's min comes
    // from a burst-free rep minutes apart.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "5").toInt
    // A query that throws must record an ERROR, never a wall-time: round 5
    // benched 6 analysis-failing queries as 0.057–0.065 s rows, which read
    // as a 10× speedup in the artifact. Right = None + message.
    def runOnce(q: graft.queries.Q): Either[String, Double] = {
      val t0 = System.nanoTime()
      val res =
        try {
          q.spark(spark, sfDir).write.format("noop").mode("overwrite").save()
          Right((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          System.err.println(s"[bench] ${q.name} FAILED: ${e.getMessage}")
          Left(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(300)}")
        }
      // frames persisted inside a query (minhash signatures, tf) are
      // dead after its run — drop them so later queries get full memory
      spark.catalog.clearCache()
      res
    }
    val times = Array.fill(headline.length)(List.empty[Double])
    val errors = Array.fill[Option[String]](headline.length)(None)
    for (_ <- 1 to reps; (q, i) <- headline.zipWithIndex)
      if (errors(i).isEmpty) runOnce(q) match {
        case Right(dt) => times(i) ::= dt
        case Left(msg) => errors(i) = Some(msg)
      }
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    val ok = headline.zipWithIndex.filter { case (_, i) => errors(i).isEmpty }
      .map { case (q, i) => (q.name, times(i).min, times(i).max / times(i).min) }
    val failed = headline.zipWithIndex
      .collect { case (q, i) if errors(i).isDefined => (q.name, errors(i).get) }
    val qs = ok.map { case (k, v, _) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val spread = ok.map { case (k, _, s) => "\"" + k + f"\":$s%.2f" }
      .mkString("{", ",", "}")
    val errJson = failed.map { case (k, m) => s"${jstr(k)}:${jstr(m)}" }
      .mkString("{", ",", "}")
    val total = ok.map(_._2).sum
    val line = f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"spread":$spread,"errors":$errJson,"n_ok":${ok.length},"n_err":${failed.length},"reps":$reps,"stat":"min","sf":"$sfDir"}"""
    println(line)
    // The driver captures a front-truncated TAIL of stdout, so a long
    // JSON line can lose its leading fields in the artifact (BENCH_r06's
    // `parsed: null`). Persist the full line to a file a reader can pick
    // up regardless of console truncation.
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_LOCAL.json"), line + "\n")
    catch { case _: Throwable => () }
    spark.stop()
    // Nonzero rc on any failed query: a bench with missing rows must not
    // pass for a clean (faster) run.
    if (failed.nonEmpty) sys.exit(1)
  }
}
