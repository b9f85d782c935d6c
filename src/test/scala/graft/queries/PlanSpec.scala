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
}
