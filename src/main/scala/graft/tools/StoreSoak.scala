package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Fs
import graft.ops.ClusteredStore

/** ClusteredStore longevity soak — the measurement the bench fixtures
  * can't give: a table is maintained FOREVER, so the costs that matter
  * are per-commit latency AS A FUNCTION OF VERSION COUNT and the
  * file-count envelope under append + compact + vacuum. The r8 design
  * re-read every prior manifest per commit (O(versions) reads, O(v²)
  * cumulative over a stream's life); the r9 explicit-lineage commit
  * reads exactly one manifest — this soak drives hundreds of streaming
  * micro-batches through `appendStream` with periodic `compact` and
  * `vacuum` and records the latency curve that proves the flat shape.
  *
  * Usage: runMain graft.tools.StoreSoak [nBatches [rowsPerBatch]]
  * (defaults 200 / 5000). Emits one JSON line per batch:
  *   {"batch":k,"version":v,"append_ms":…,"files":manifestFiles,
  *    "disk_files":dataFilesOnDisk,"versions":committedManifests,
  *    "rows":totalRows[,"compact_ms":…][,"vacuum_ms":…,"reclaimed":…]}
  * and a final summary line with the first-vs-last decile mean append
  * latency (flat ⇒ ratio ≈ 1; the old design would trend linearly).
  *
  * Batch shape mirrors a real ingest: each micro-batch is LOCALIZED in
  * key space (a drifting window over the frozen domain), so appends
  * exercise the merge-rewrite path, not just gap inserts; every 10th
  * batch strays partly outside the frozen bounds so the drift counter
  * accrues like a production stream's would.
  */
object StoreSoak {
  def main(args: Array[String]): Unit = {
    val nBatches = args.headOption.map(_.toInt).getOrElse(200)
    val rowsPerBatch = args.drop(1).headOption.map(_.toInt).getOrElse(5000)
    val compactEvery = 25
    val vacuumEvery = 50
    val keepLast = 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.ensureRegistered(spark)
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("graft_soak").toString
    def base(n: Long) = spark.range(n)
      .select(col("id"),
        pmod(col("id") * 7919, lit(100000)).as("a"),
        pmod(col("id") * 104729, lit(100000)).as("b"),
        concat(lit("payload-"), col("id")).as("payload"))
    ClusteredStore.init(base(200000), Seq("a", "b"), 64, dir)

    def batchDf(k: Int) = {
      // drifting localized window; every 10th batch 20% out-of-bounds
      val lo = (k * 1837) % 90000
      val idBase = 1000000L + k.toLong * rowsPerBatch
      spark.range(idBase, idBase + rowsPerBatch)
        .select(col("id"),
          (lit(lo) + pmod(col("id"), lit(5000)) +
            when(lit(k % 10 == 0) && pmod(col("id"), lit(5)) === 0,
              lit(120000)).otherwise(lit(0))).as("a"),
          (lit(lo) + pmod(col("id") * 31, lit(5000))).as("b"),
          concat(lit(s"batch$k-"), col("id")).as("payload"))
    }

    def diskFiles(): Int = Fs.list(spark, s"$dir/data")
      .count(f => !f.getPath.getName.startsWith("_"))
    def versions(): Int = Fs.list(spark, s"$dir/ledger")
      .count(_.getPath.getName.startsWith("v="))

    val appendMs = Array.ofDim[Double](nBatches)
    var totalRows = 200000L
    for (k <- 0 until nBatches) {
      val t0 = System.nanoTime()
      val st = ClusteredStore.appendStream(spark, dir, batchDf(k), k.toLong)
      val ms = (System.nanoTime() - t0) / 1e6
      appendMs(k) = ms
      totalRows += rowsPerBatch
      val s = ClusteredStore.stats(spark, dir)
      val extra = new StringBuilder
      if ((k + 1) % compactEvery == 0) {
        val c0 = System.nanoTime()
        val cs = ClusteredStore.compact(spark, dir)
        extra ++= f""","compact_ms":${(System.nanoTime() - c0) / 1e6}%.0f"""
        extra ++= s""","compacted":${cs.rewritten}"""
      }
      if ((k + 1) % vacuumEvery == 0) {
        val v0 = System.nanoTime()
        val reclaimed = ClusteredStore.vacuum(spark, dir, keepLast)
        extra ++= f""","vacuum_ms":${(System.nanoTime() - v0) / 1e6}%.0f"""
        extra ++= s""","reclaimed":$reclaimed"""
      }
      println(f"""{"batch":$k,"version":${st.version},"append_ms":$ms%.0f,""" +
        s""""files":${s.nFiles},"disk_files":${diskFiles()},""" +
        s""""versions":${versions()},"rows":${s.nRows},""" +
        f""""clamp_rate":${s.clampRate}%.4f${extra.result()}}""")
    }

    // exactness spot-check after the whole campaign: every batch exactly
    // once (count identity is a strong invariant: duplicated-adoption or
    // lost-update bugs both break it)
    val got = ClusteredStore.read(spark, dir).count()
    val decile = math.max(1, nBatches / 10)
    def mean(xs: Seq[Double]) = xs.sum / xs.size
    val first = mean(appendMs.take(decile).toSeq)
    val last = mean(appendMs.takeRight(decile).toSeq)
    println(f"""{"metric":"store_soak","batches":$nBatches,""" +
      s""""rows_expected":$totalRows,"rows_got":$got,""" +
      f""""first_decile_append_ms":$first%.0f,""" +
      f""""last_decile_append_ms":$last%.0f,""" +
      f""""last_over_first":${last / first}%.2f}""")
    if (got != totalRows) sys.exit(1)
    spark.stop()
  }
}
