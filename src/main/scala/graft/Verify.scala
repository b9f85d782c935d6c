package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import java.util.concurrent.{Executors, TimeUnit}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Queries run concurrently on a small thread pool: Spark's scheduler
  * interleaves independent jobs on the local executor, so the wall time of
  * the ~70-query sweep is bounded by the few expensive queries instead of
  * the sum. Each query writes its own output dir and registers no shared
  * temp views, so runs are independent.
  *
  * Args: <sfDir> <outDir> [queryName...] — optional trailing names restrict
  * the run (local iteration); the driver's 2-arg call runs everything.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Verify <sfDir> <outDir> [query...]")
    val sfDir = args(0)
    val outDir = args(1)
    // Must precede any SparkEntry/Registry access: LogInteropQuery captures
    // this at object init, giving each scale factor its own interop log dir
    // (concurrent or interleaved sweeps at different SFs stay independent).
    sys.props("graft.interop.dir") =
      "/tmp/graft_interop_log_" + sfDir.replaceAll("[^A-Za-z0-9]", "_")
    sys.props("graft.runtree.dir") =
      "/tmp/graft_runtree_log_" + sfDir.replaceAll("[^A-Za-z0-9]", "_")
    sys.props("graft.shred.dir") =
      "/tmp/graft_shred_log_" + sfDir.replaceAll("[^A-Za-z0-9]", "_")
    sys.props("graft.rollup.dir") =
      "/tmp/graft_rollup_log_" + sfDir.replaceAll("[^A-Za-z0-9]", "_")
    // r15: the streaming-tick fixture was the ONE fixture dir not
    // namespaced by scale factor — two concurrent Verify sweeps at
    // different SFs raced each other's delete/rebuild of
    // /tmp/graft_rollup_stream_* and one read a torn mixture
    // (observed as a longdoc-gate q_rollup_stream hash mismatch while
    // a sf0.1 sweep ran alongside)
    sys.props("graft.rollupstream.dir") =
      "/tmp/graft_rollup_stream_" + sfDir.replaceAll("[^A-Za-z0-9]", "_")
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Register native functions/strategies once, before any pooled query
    // can race the registration (losers of the old check could analyze a
    // query before md5num/kll_sketch_agg existed and be silently dropped).
    graft.functions.GraftFunctions.ensureRegistered(spark)
    new java.io.File(outDir).mkdirs()
    val todo = SparkEntry.queries.toSeq
      .filter { case (n, _) => only.isEmpty || only(n) }
    val parallelism =
      sys.env.getOrElse("SPARK_GRAFT_VERIFY_PAR", "6").toInt
    val pool = Executors.newFixedThreadPool(parallelism)
    // Frames persisted inside a query (minhash signatures, tf, LSH
    // projections) are dead once its write completes. The per-query
    // clearCache() that used to live here was a correctness hazard:
    // clearing while ANOTHER pooled query is mid-flight yanks a cached
    // frame out from under a running plan, which has produced an empty
    // (0-row) result under AQE (observed once on q_tfidf_top_term at
    // sf0.1 — its persisted tf frame was cleared by a concurrently
    // finishing query). The cache is now cleared only when NO query is
    // in flight — with a saturated pool that is the end of the sweep, so
    // accumulation is bounded by one sweep (tens of MB at sf0.1) and
    // freed before the session is reused.
    val inFlight = new java.util.concurrent.atomic.AtomicInteger(todo.size)
    // Every query that throws lands here and in _failures.json — round 5
    // proved that stderr-only reporting lets a 15-query regression read as
    // a clean artifact (the driver's compare simply skipped the missing
    // output dirs).
    val failures =
      new java.util.concurrent.ConcurrentHashMap[String, String]()
    todo.foreach { case (name, fn) =>
      pool.submit(new Runnable {
        def run(): Unit = {
          try {
            fn(spark, sfDir).coalesce(1).write.mode("overwrite")
              .parquet(s"$outDir/$name")
          }
          catch { case e: Throwable =>
            System.err.println(s"[verify] $name failed: ${e.getMessage}")
            failures.put(name,
              s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(500)}")
            // Also land the failure IN the per-query artifact: a one-row
            // `_graft_error` parquet where the result would be. A compare
            // that skips missing output dirs (the driver's does) would
            // otherwise record a partial sweep as clean; this way a failed
            // query surfaces as an explicit schema-mismatch red row.
            try {
              import spark.implicits._
              Seq(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(500)}")
                .toDF("_graft_error").coalesce(1)
                .write.mode("overwrite").parquet(s"$outDir/$name")
            } catch { case _: Throwable => () }
          }
          finally {
            if (inFlight.decrementAndGet() == 0 &&
                spark.sparkContext.getPersistentRDDs.nonEmpty)
              spark.catalog.clearCache()
          }
        }
      })
    }
    pool.shutdown()
    pool.awaitTermination(4, TimeUnit.HOURS)
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Self-describing failure manifest: always written (empty object when
    // clean) so its ABSENCE is also a signal, and a consumer reading only
    // the output dir can distinguish "all green" from "silently skipped".
    import scala.jdk.CollectionConverters._
    val failJson = failures.asScala.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/_failures.json"), failJson)
    spark.stop()
    // rc stays 0 even on per-query failure: the driver must still run the
    // DuckDB compare over every query that DID produce output (a nonzero
    // exit could abort the whole correctness pass and hide the green
    // majority). The manifest + stderr banner carry the failure signal.
    if (!failures.isEmpty)
      System.err.println(
        s"[verify] ${failures.size}/${todo.size} queries FAILED — see $outDir/_failures.json")
  }
}
