package graft.queries

import graft.SparkSpec

/** Physical-plan shape assertions for the headline operators: these are
  * the properties that decide 100 TB behavior (scan pushdown, column
  * pruning, broadcast vs shuffle joins, partial aggregation, native
  * expressions staying inside codegen) — asserted on the real executed
  * plans so a regression in plan shape fails CI even while results stay
  * correct.
  */
class PlanSpec extends SparkSpec {

  private def plan(q: Q): String = {
    val df = q.spark(spark, sf())
    // execute first: under AQE the pre-execution plan is not final (and
    // carries no codegen markers); the post-execution string is the plan
    // that actually ran
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("q1: shipdate filter is pushed to the parquet scan, agg is two-phase") {
    val p = plan(RelationalQueries.q1PricingSummary)
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p.take(2000))
    assert(p.contains("partial_sum"), "missing map-side partial aggregation")
    // whole-stage codegen shows as "*(n)" stage markers in the plan string
    assert(p.contains("*("), "no whole-stage codegen stages in the plan")
  }

  test("q3: dimension joins broadcast — the fact table never shuffles for them") {
    val p = plan(RelationalQueries.q3ShippingPriority)
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("range join: band dimension goes through a broadcast nested-loop join") {
    val p = plan(ScaleQueries.rangeJoin)
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("stratified sample: text column is pruned from the scan") {
    val p = plan(ScaleQueries.sampleStratified)
    val readSchema = p.linesIterator.find(_.contains("ReadSchema"))
    assert(readSchema.exists(!_.contains("text")),
      s"scan reads pruned column: $readSchema")
  }

  test("exists subquery decorrelates to a semi join (no per-row re-scan)") {
    val p = plan(SubqueryQueries.existsUrgent)
    assert(p.contains("LeftSemi"), p.take(2000))
  }

  test("minhash: native signature expression present in the plan") {
    val p = plan(DedupQueries.minhashLsh)
    assert(p.contains("minhash_sig"), p.take(2000))
  }

  test("q5: every dimension join broadcasts — zero sort-merge joins") {
    val p = plan(RelationalQueries.q5LocalSupplier)
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"),
      "a dim join fell back to sort-merge:\n" + p.take(3000))
  }

  test("global top-k plans as TakeOrdered (partial per-partition top-k), " +
    "not a full sort") {
    val p = plan(AnalyticsQueries.topTokens)
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("capped sample: the per-group rank plans as WindowGroupLimit " +
    "(partial per-partition top-k before the shuffle)") {
    val p = plan(ScaleQueries.cappedSample)
    assert(p.contains("WindowGroupLimit"), p.take(2000))
  }

  test("bloom pre-join: the might_contain filter sits directly on the " +
    "fact scan — before any exchange or join") {
    val p = plan(ScaleQueries.bloomPrejoin)
    val lines = p.linesIterator.toVector
    val fi = lines.indexWhere(_.contains("might_contain"))
    assert(fi >= 0, "no might_contain filter in the plan:\n" + p.take(2000))
    val scanAfter = lines.indexWhere(l =>
      l.contains("FileScan parquet") && l.contains("lineitem"), fi)
    assert(scanAfter > fi,
      "no lineitem scan below the bloom filter:\n" + p.take(2000))
    val between = lines.slice(fi + 1, scanAfter)
    assert(!between.exists(l =>
        l.contains("Exchange") || l.contains("Join")),
      "bloom filter is not adjacent to the scan:\n" +
        between.mkString("\n"))
  }

  test("bloom suppression: the pass-through branch (bloom misses) reaches " +
    "the union with zero exchanges and zero joins — only hits pay a join") {
    import org.apache.spark.sql.functions._
    val docs = tbl(spark, sf(), "documents")
      .withColumn("fp", expr("md5num(text)"))
    val trained = docs.filter(col("doc_id") % 3 === 0).select(col("fp"))
    // AQE wraps the union in query stages, hiding it from collect();
    // the branch shapes under test are identical either way
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val union =
      try {
        val df = graft.ops.BloomSuppress.antiJoin(docs, trained, "fp")
        df.collect()
        df.queryExecution.executedPlan.collectFirst {
          case u: org.apache.spark.sql.execution.UnionExec => u
        }
      } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert(union.nonEmpty, "no union in plan")
    val branches = union.get.children.map(_.toString)
    // exactly one branch must be exchange- and join-free: scan → probe
    // filter → project, nothing else (NOT bloom_contains on the miss side)
    val passThrough = branches.filter(b =>
      !b.contains("Exchange") && !b.contains("Join"))
    assert(passThrough.size == 1,
      s"expected exactly one shuffle-free pass-through branch, got " +
        s"${passThrough.size}:\n" + branches.mkString("\n---\n"))
    assert(passThrough.head.contains("NOT bloom_contains"))
  }

  test("stats-ledger pruned read scans only the surviving file list") {
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Files.createTempDirectory("planprune").toString
    val ev = tbl(spark, sf(), "events").select("event_id", "user_id")
    ev.repartitionByRange(8, col("user_id")).sortWithinPartitions("user_id")
      .write.mode("overwrite").parquet(s"$base/d")
    graft.ops.StatsLedger.build(spark, s"$base/d", s"$base/l", Seq("user_id"))
    val boxes = Seq(graft.ops.StatsLedger.Box.between("user_id", 4L, 6L))
    val survivors =
      graft.ops.StatsLedger.pruneFiles(spark, s"$base/l", boxes)
    val df = graft.ops.StatsLedger.readPruned(spark, s"$base/d", s"$base/l",
      boxes)
    df.collect()
    val scans = df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    val scannedFiles = scans.flatMap(_.relation.location.inputFiles).toSet
    assert(scannedFiles.size == survivors.size,
      s"scan reads ${scannedFiles.size} files, ledger kept " +
        s"${survivors.size}")
    val total = spark.read.parquet(s"$base/d").inputFiles.length
    assert(scannedFiles.size < total, "pruned read scanned every file")
  }
}
