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
  * micro-batches through `appendStream` with a `maintain` policy tick
  * every 10th batch (the SHIPPED measured-decision loop, not a hand
  * schedule: compact fires on the small-file fraction, recluster on the
  * accumulated clamp rate, vacuum on the retained-version budget) and
  * records the latency curve that proves the flat shape.
  *
  * Usage: runMain graft.tools.StoreSoak [nBatches [rowsPerBatch]]
  * (defaults 200 / 5000). Emits one JSON line per batch:
  *   {"batch":k,"version":v,"append_ms":…,"files":manifestFiles,
  *    "disk_files":dataFilesOnDisk,"versions":committedManifests,
  *    "rows":totalRows[,"maintain_ms":…,"compacted":…,"reclustered":…,
  *    "vacuumed":…]}
  * and a final summary line with the first-vs-last decile mean append
  * latency (flat ⇒ ratio ≈ 1; the old design would trend linearly).
  * The clamp threshold is set low enough (0.01) that the soak's drift
  * regime crosses it mid-run, so the curve shows at least one full
  * drift → recluster → counter-reset cycle firing FROM the policy.
  *
  * Batch shape mirrors a real ingest and exercises every maintenance
  * path: the store is initialized over the LOWER HALF of the frozen key
  * domain (bounds frozen on sentinel corners), so two batch regimes
  * coexist — two thirds of batches are LOCALIZED windows over covered
  * key space (the merge-rewrite path), one third is a SKINNY batch
  * landing in the virgin upper half (the gap-insert path); every 10th
  * batch also strays partly outside the frozen bounds so the drift
  * counter accrues like a production stream's would.
  *
  * The gap regime drops its boxes in the curve's LAST quadrant
  * (high-a, low-b): the file holding the frozen-bound sentinels spans
  * the whole (high-a, high-b) quadrant's curve range, so boxes there
  * merge into it instead of accumulating — the last quadrant is past
  * every live interval, so each box becomes its own small fresh file
  * (split staging keeps its interval tight), and the accumulated
  * smalls are exactly the debt `compact`'s own mean/2 policy must
  * find and fold. File count must sawtooth — climb between
  * compactions, fold at each one, never trend upward — and that
  * envelope, plus the flat append-latency curve, is what this harness
  * records.
  */
object StoreSoak {
  def main(args: Array[String]): Unit = {
    val nBatches = args.headOption.map(_.toInt).getOrElse(200)
    val rowsPerBatch = args.drop(1).headOption.map(_.toInt).getOrElse(5000)
    val maintainEvery = 10
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
    // data occupies [0, 50k); bounds are frozen to [0, 100k] by two
    // sentinel corner rows, leaving the upper half of curve space VIRGIN
    // — gap-insert batches land there as new files
    def base(n: Long) = spark.range(n)
      .select(col("id"),
        pmod(col("id") * 7919, lit(50000)).as("a"),
        pmod(col("id") * 104729, lit(50000)).as("b"),
        concat(lit("payload-"), col("id")).as("payload"))
      .unionByName(spark.range(2).select((col("id") - 10).as("id"),
        lit(100000L).as("a"), lit(100000L).as("b"),
        lit("sentinel").as("payload")))
    ClusteredStore.init(base(200000), Seq("a", "b"), 64, dir)

    def batchDf(k: Int) = {
      val idBase = 1000000L + k.toLong * rowsPerBatch
      val ids = spark.range(idBase, idBase + rowsPerBatch)
      if (k % 3 == 2) {
        // gap regime: a SKINNY batch (rowsPerBatch/16 — real streams
        // deliver skinny micro-batches) in a TINY box (50×50) at a
        // pseudo-randomly striding spot in the virgin LAST quadrant
        // (high a, low b — see the class comment for why the (high,
        // high) quadrant would be absorbed instead of accumulating)
        val g = k / 3
        val loA = 52000 + (g * 7919) % 45000
        val loB = 2000 + (g * 4793) % 45000
        ids.limit(rowsPerBatch / 16).select(col("id"),
          (lit(loA) + pmod(col("id"), lit(50))).as("a"),
          (lit(loB) + pmod(col("id") * 31, lit(50))).as("b"),
          concat(lit(s"batch$k-"), col("id")).as("payload"))
      } else {
        // merge regime: localized window over covered space; every 10th
        // batch 20% out-of-bounds (drift clamps to the edge cells)
        val lo = (k * 1837) % 45000
        ids.select(col("id"),
          (lit(lo) + pmod(col("id"), lit(5000)) +
            when(lit(k % 10 == 0) && pmod(col("id"), lit(5)) === 0,
              lit(120000)).otherwise(lit(0))).as("a"),
          (lit(lo) + pmod(col("id") * 31, lit(5000))).as("b"),
          concat(lit(s"batch$k-"), col("id")).as("payload"))
      }
    }

    def diskFiles(): Int = Fs.list(spark, s"$dir/data")
      .count(f => !f.getPath.getName.startsWith("_"))
    def versions(): Int = Fs.list(spark, s"$dir/ledger")
      .count(_.getPath.getName.startsWith("v="))

    val appendMs = Array.ofDim[Double](nBatches)
    var totalRows = 200002L // base + 2 sentinel corners
    for (k <- 0 until nBatches) {
      val t0 = System.nanoTime()
      val st = ClusteredStore.appendStream(spark, dir, batchDf(k), k.toLong)
      val ms = (System.nanoTime() - t0) / 1e6
      appendMs(k) = ms
      totalRows += (if (k % 3 == 2) rowsPerBatch / 16 else rowsPerBatch)
      val s = ClusteredStore.stats(spark, dir)
      val extra = new StringBuilder
      if ((k + 1) % maintainEvery == 0) {
        val m0 = System.nanoTime()
        val mr = ClusteredStore.maintain(spark, dir,
          smallFileFrac = 0.05, clampRateMax = 0.01,
          maxVersions = 20, keepLast = 5)
        extra ++= f""","maintain_ms":${(System.nanoTime() - m0) / 1e6}%.0f"""
        extra ++= s""","compacted":${mr.compactedFiles}"""
        extra ++= s""","reclustered":${mr.reclustered}"""
        extra ++= s""","vacuumed":${mr.vacuumedFiles}"""
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
