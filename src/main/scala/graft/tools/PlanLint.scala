package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec

import graft.queries.Registry

/** Automated physical-plan audit over the WHOLE query registry — the
  * scale-hygiene checks a reviewer does by hand on one query, run as a
  * gate over all of them.
  *
  * Per query (built at a small SF; planning is what's inspected, data
  * size is irrelevant), walk the executed plan and flag:
  *
  *   - `CartesianProductExec` — an unconditioned shuffled cross join is
  *     never the 100 TB plan;
  *   - `BroadcastNestedLoopJoinExec` — legitimate ONLY when one side is
  *     a documented bounded frame (exact-baseline probes);
  *   - `WindowExec` with an EMPTY partition spec — the single-partition
  *     global window. Legitimate ONLY on a bounded frame (post-`limit`
  *     rank assembly), never on a corpus;
  *   - driver-side scans: queries are declarative, so none expected.
  *
  * Every tolerated instance lives in the ALLOWLIST below with the
  * reason; an unlisted hit (or a stale allowlist entry that stopped
  * matching — rot cuts both ways) exits non-zero. This turns "the plan
  * audit found no scale-killer" from a round-note claim into a
  * repeatable command: runMain graft.tools.PlanLint [sfDir]
  */
object PlanLint {

  /** query -> (flag kind -> why it is acceptable there). */
  private val allow: Map[String, Map[String, String]] = Map(
    "q_knn_brute" -> Map(
      "bnlj" -> ("documented exact ANN baseline: probe side is a fixed " +
        "8-query broadcast frame (filter on vec_id — semantically, not " +
        "structurally, bounded)")),
    "q_hybrid_rrf" -> Map(
      "bnlj" -> "single-row query-vector broadcast onto the corpus scan"),
    "q_knn_int8" -> Map(
      "bnlj" -> "single-row quantized query broadcast onto the scan"),
    "q_mmr_rerank" -> Map(
      "bnlj" -> "single-row query broadcast; candidate pool is k rows"),
    "q_ann_recall" -> Map(
      "bnlj" -> ("fixed 8-probe frame (filter on vec_id) broadcast for " +
        "the exact-baseline leg of the recall measurement")),
    "q_knn_pq" -> Map(
      "bnlj" -> ("fixed probe frame broadcast onto the ADC scan; " +
        "codebooks ride the same broadcast")),
    "q_pq_append_recall" -> Map(
      "bnlj" -> "fixed probe frame broadcast, as q_knn_pq"),
    "q_ann_cost" -> Map(
      "bnlj" -> ("decision-table harness replays every method's probe " +
        "frame, including the brute-force exact leg")))

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    var bad = List.empty[String]
    var used = Set.empty[(String, String)]
    var nChecked = 0
    Registry.all.foreach { q =>
      val flags: Seq[String] =
        try {
          val plan = q.spark(spark, sfDir).queryExecution.executedPlan
          nChecked += 1
          lint(plan)
        } catch {
          case e: Throwable =>
            bad ::= s"${q.name}: failed to plan: ${e.getMessage}"
            Seq.empty
        }
      flags.foreach { f =>
        allow.get(q.name).flatMap(_.get(f)) match {
          case Some(_) => used += ((q.name, f))
          case None => bad ::= s"${q.name}: $f not allowlisted"
        }
      }
    }
    // stale allowlist entries are failures too
    val stale = for {
      (qn, fs) <- allow.toSeq
      f <- fs.keys if !used((qn, f))
    } yield s"$qn: allowlisted '$f' no longer occurs — remove the entry"

    val problems = bad.reverse ++ stale
    println(s"""{"metric":"plan_lint","queries":$nChecked,""" +
      s""""allowlisted":${used.size},"problems":${problems.size}}""")
    problems.foreach(p => System.err.println(s"[planlint] $p"))
    if (problems.nonEmpty) sys.exit(1)
    spark.stop()
  }

  /** Flag kinds present in one plan (deduped). AQE wraps the real plan
    * in AdaptiveSparkPlanExec whose `children` is empty, so a naive
    * `collect` sees nothing — expand adaptive wrappers and subquery
    * plans explicitly.
    */
  def lint(plan: SparkPlan): Seq[String] = {
    def expand(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: org.apache.spark.sql.execution.adaptive
          .AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case o => o.children
      }
      p +: (kids ++ p.subqueries).flatMap(expand)
    }
    // A BNLJ whose broadcast side is STRUCTURALLY bounded — a global
    // aggregate (exactly one row), a global limit / top-k, or a literal
    // local table — is the standard "broadcast tiny frame onto the
    // scan" idiom (rank-model bounds, query vectors, spine rows) and
    // scales by construction. Only semantically-bounded sides (a filter
    // on a handful of ids) need the allowlist.
    def bounded(p: SparkPlan): Boolean = expand(p).exists {
      case agg: org.apache.spark.sql.execution.aggregate.BaseAggregateExec =>
        agg.groupingExpressions.isEmpty
      case _: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => true
      case _: org.apache.spark.sql.execution.GlobalLimitExec => true
      case _: org.apache.spark.sql.execution.CollectLimitExec => true
      case _: org.apache.spark.sql.execution.LocalTableScanExec => true
      case _ => false
    }
    expand(plan).collect {
      case _: CartesianProductExec => "cartesian"
      case b: BroadcastNestedLoopJoinExec =>
        val bcast = b.buildSide match {
          case org.apache.spark.sql.catalyst.optimizer.BuildLeft => b.left
          case org.apache.spark.sql.catalyst.optimizer.BuildRight => b.right
        }
        if (bounded(bcast)) "bnlj_bounded" else "bnlj"
      case w: WindowExec if w.partitionSpec.isEmpty =>
        // a global window over an already-bounded frame (rank assembly
        // after a top-k cut) is k rows in one task — fine
        if (w.children.exists(bounded)) "global_window_bounded"
        else "global_window"
    }.distinct.filterNot(_.endsWith("_bounded"))
  }
}
