package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.query.LogRollup
import graft.streaming.LogStreamPipeline

/** Run-scoped forget (r14 verdict missing #2): "delete this run and
  * its descendants" over the reference's run-hierarchy model — subtree
  * expansion BEFORE the ledger pins the set (the detail purge destroys
  * the parent-pointer evidence), run-keyed purges across all three log
  * stores through the crash-replayable orchestrator, and the r14
  * advice fix for the re-fold's layout-misalignment window (a tick
  * crashed between the shred and rollup folds must not let the re-fold
  * ack while stale pre-fold dirs keep serving the banned contribution).
  */
class RunForgetSpec extends SparkSpec {

  /** Chains of three: run-(3k) root, run-(3k+1) its child,
    * run-(3k+2) its grandchild — two date partitions.
    */
  private def entries(n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      val day = 1 + (i % 2)
      val parent = i % 3 match {
        case 0 => ""
        case _ => s"run-${i - 1}"
      }
      graft.core.LogEntry(
        Timestamp.valueOf(f"2024-03-0$day 10:00:${i % 60}%02d"),
        s"run-$i", parent, s"user-${i % 4}",
        if (i % 2 == 0) "llm_end" else "llm_start",
        """{"job":"t"}""",
        s"""{"event_type":"llm_end","data":{"model":"m${i % 2}",
           |"usage_metadata":{"input_tokens":${i + 1},
           |"output_tokens":${2 * i},"total_tokens":${3 * i + 1}}}}"""
          .stripMargin.replace("\n", ""))
    }.toDF()
  }

  private def mkStores(tag: String, rows: DataFrame, ticks: Int = 3,
      compactEvery: Int = 2): (String, String, String) = {
    val base = java.nio.file.Files.createTempDirectory(tag).toString
    val (log, shred, roll) = (s"$base/log", s"$base/shred", s"$base/roll")
    LogStreamPipeline.invalidateHorizonCache()
    (0 until ticks).foreach { b =>
      LogStreamPipeline.tick(
        rows.filter(pmod(hash(col("run_id")), lit(ticks)) === b),
        b.toLong, log, shred, roll, compactEvery = compactEvery)
    }
    (log, shred, roll)
  }

  private def rawCol(dir: String, c: String): Set[String] =
    spark.read.parquet(graft.core.Fs.listDataFiles(spark, dir)
        .filter(_.endsWith(".parquet")): _*)
      .select(c).distinct().collect().map(_.getString(0)).toSet

  private def served(dir: String) = LogRollup.read(spark, dir, Seq("model"))
    .select("model", "n_events", "n_llm_end", "in_tokens", "out_tokens",
      "tot_tokens", "n_errors", "min_us", "max_us")
    .orderBy("model").collect().toSeq

  test("expandRunSubtree: a root SET expands to the full descendant " +
    "closure via frontier BFS (equi-joins only), roots included, and " +
    "a parent-pointer cycle fails loudly instead of spinning") {
    import spark.implicits._
    val all = entries(30)
    val (log, _, _) = mkStores("rf1", all)
    val got = LogForget.expandRunSubtree(spark, log,
        Seq("run-0", "run-6").toDF("r"))
      .collect().map(_.getString(0)).toSet
    assert(got === Set("run-0", "run-1", "run-2", "run-6", "run-7",
      "run-8"))
    // a root with no log rows expands to itself
    val lone = LogForget.expandRunSubtree(spark, log,
        Seq("run-999").toDF("r"))
      .collect().map(_.getString(0)).toSet
    assert(lone === Set("run-999"))

    // a parent-pointer CYCLE converges to its closure (acc grows
    // monotonically — the anti-join stops re-visiting), it does not
    // spin: forgetting "a" in a<->b takes both out, the safe answer
    val cyc = java.nio.file.Files.createTempDirectory("rfc").toString
    LogStreamPipeline.invalidateHorizonCache()
    LogStreamPipeline.tick(
      Seq(
        graft.core.LogEntry(Timestamp.valueOf("2024-03-01 10:00:00"),
          "a", "b", "u", "llm_end", "{}", "{}"),
        graft.core.LogEntry(Timestamp.valueOf("2024-03-01 10:00:01"),
          "b", "a", "u", "llm_end", "{}", "{}")).toDF(),
      0L, s"$cyc/log", s"$cyc/shred", s"$cyc/roll")
    assert(LogForget.expandRunSubtree(spark, s"$cyc/log",
        Seq("a").toDF("r"), maxDepth = 8)
      .collect().map(_.getString(0)).toSet === Set("a", "b"))

    // a chain deeper than maxDepth fails loudly instead of narrowing
    // the request to a partial subtree
    val deep = java.nio.file.Files.createTempDirectory("rfd").toString
    LogStreamPipeline.invalidateHorizonCache()
    LogStreamPipeline.tick(
      (0 until 10).map(i =>
        graft.core.LogEntry(Timestamp.valueOf("2024-03-01 10:00:00"),
          s"c$i", if (i == 0) "" else s"c${i - 1}", "u", "llm_end",
          "{}", "{}")).toDF(),
      0L, s"$deep/log", s"$deep/shred", s"$deep/roll")
    intercept[IllegalStateException] {
      LogForget.expandRunSubtree(spark, s"$deep/log",
        Seq("c0").toDF("r"), maxDepth = 4)
    }
  }

  test("run-scoped orchestrated forget: expansion pinned BEFORE the " +
    "purge, crash at the shred store, REGISTRY-FREE replay — " +
    "descendants physically gone from detail and shred, rollup equals " +
    "the complement pipeline") {
    val all = entries(36)
    val (log, shred, roll) = mkStores("rf2", all)
    val ledger = java.nio.file.Files.createTempDirectory("rf2l").toString

    import spark.implicits._
    // forget root run-12 and its descendants run-13, run-14
    val expanded = LogForget.expandRunSubtree(spark, log,
      Seq("run-12").toDF("r"))
    assert(expanded.count() === 3)

    val Seq(rollT, detailT, shredT) =
      Forget.logRunTargets(spark, log, shred, roll)
    val crashShred = new Forget.Target(shredT.name, shredT.kind,
      shredT.path, shredT.arg, shredT.domain,
      _ => throw new RuntimeException("injected crash"))
    intercept[RuntimeException] {
      Forget.forgetFrame(spark, ledger, "gdpr-run12", Some(expanded),
        Seq(rollT, detailT, crashShred), Forget.DomString)
    }
    val banned = Set("run-12", "run-13", "run-14")
    assert(rawCol(shred, "run_id").intersect(banned) === banned,
      "mid-crash: the shred store still serves the whole subtree")
    assert(rawCol(log, "run_id").intersect(banned) === Set.empty,
      "mid-crash: the detail purge had already acked")

    // process loss: registry-free replay rebuilds the run-keyed targets
    assert(Forget.replay(spark, ledger) === 1)
    assert(rawCol(shred, "run_id").intersect(banned) === Set.empty)
    assert(Forget.replay(spark, ledger) === 0)

    // end state == complement pipeline across all three stores
    val (logC, shredC, rollC) = mkStores("rf2c",
      all.filter(!col("run_id").isin(banned.toSeq: _*)))
    assert(rawCol(log, "run_id") === rawCol(logC, "run_id"))
    assert(rawCol(shred, "run_id") === rawCol(shredC, "run_id"))
    assert(served(roll) === served(rollC),
      "run-scoped re-fold must subtract the subtree exactly")
  }

  test("forgetRunSubtree: the one-call entry expands roots and drives " +
    "all three run-keyed targets through the ledger") {
    val all = entries(27)
    val (log, shred, roll) = mkStores("rf4", all)
    val ledger = java.nio.file.Files.createTempDirectory("rf4l").toString
    LogForget.forgetRunSubtree(spark, ledger, "req-run-0",
      Seq("run-0", "run-18"), log, shred, roll)
    val banned = Set("run-0", "run-1", "run-2", "run-18", "run-19",
      "run-20")
    assert(rawCol(log, "run_id").intersect(banned) === Set.empty)
    assert(rawCol(shred, "run_id").intersect(banned) === Set.empty)
    assert(Forget.status(spark, ledger,
        Forget.logRunTargets(spark, log, shred, roll).map(_.name))
      .filter(!col("acked")).count() === 0)
    // a crash-replay caller without closures converges the same request
    assert(Forget.replay(spark, ledger) === 0)
  }

  test("re-fold under a crashed tick's misaligned layouts (shred " +
    "folded to gen-Nc, rollup still pre-fold): the re-fold REALIGNS " +
    "the date partition — completes the fold with the banned rows " +
    "subtracted, retires the stale dirs, never acks a silent miss") {
    val all = entries(36)
    val base = java.nio.file.Files.createTempDirectory("rf3").toString
    val (log, shred, roll) = (s"$base/log", s"$base/shred", s"$base/roll")
    LogStreamPipeline.invalidateHorizonCache()
    // ticks 0,1 land unfolded
    (0 until 2).foreach { b =>
      LogStreamPipeline.tick(
        all.filter(pmod(hash(col("run_id")), lit(3)) === b),
        b.toLong, log, shred, roll, compactEvery = 1000)
    }
    // snapshot the rollup's pre-fold state, then run the folding tick
    val snap = s"$base/roll_snapshot"
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(roll).getFileSystem(conf)
    org.apache.hadoop.fs.FileUtil.copy(fs,
      new org.apache.hadoop.fs.Path(roll), fs,
      new org.apache.hadoop.fs.Path(snap), false, conf)
    LogStreamPipeline.tick(
      all.filter(pmod(hash(col("run_id")), lit(3)) === 2),
      2L, log, shred, roll, compactEvery = 2)

    // fabricate the crash-between-folds footprint: the shred store is
    // at src=gen-2c (committed _FOLDED marker) while the rollup still
    // holds the pre-fold src=batch-0/1 dirs — plus batch-2, which the
    // fold at batchId=2 does not cover in either store
    graft.core.Fs.list(spark, roll)
      .filter(_.getPath.getName.startsWith("date=")).foreach { d =>
        graft.core.Fs.list(spark, d.getPath.toString)
          .filter(_.getPath.getName.matches("src=gen-[0-9]+c"))
          .foreach(g => graft.core.Fs.delete(spark, g.getPath.toString))
      }
    graft.core.Fs.list(spark, snap)
      .filter(_.getPath.getName.startsWith("date=")).foreach { d =>
        graft.core.Fs.list(spark, d.getPath.toString)
          .filter(_.getPath.getName.startsWith("src=batch-"))
          .foreach { s =>
            org.apache.hadoop.fs.FileUtil.copy(fs, s.getPath, fs,
              new org.apache.hadoop.fs.Path(
                s"$roll/${d.getPath.getName}/${s.getPath.getName}"),
              false, conf)
          }
      }
    val misaligned = graft.core.Fs.list(spark, roll)
      .filter(_.getPath.getName.startsWith("date="))
      .flatMap(d => graft.core.Fs.list(spark, d.getPath.toString))
      .map(_.getPath.getName)
    assert(misaligned.exists(_.startsWith("src=batch-0")),
      "fixture must hold stale pre-fold rollup dirs")
    assert(!misaligned.exists(_.matches("src=gen-[0-9]+c")),
      "fixture must have lost the rollup generation")

    // the re-fold must realign: complete the fold (recomputed from the
    // shred generation with banned rows anti-joined), mark it, retire
    // the stale dirs — and the result must equal the complement
    // pipeline, i.e. the banned contribution is actually gone
    import spark.implicits._
    // user-1 rows are all odd-indexed → every banned row lives on
    // date=2024-03-02: that date must realign; 03-01 has no hit and
    // must NOT be touched (work stays ∝ hits — its crashed fold is the
    // next tick cadence's job, and fold content-preservation keeps its
    // aggregates correct meanwhile)
    val cids = Seq("user-1").toDF("custom_id")
    assert(LogForget.refoldRollup(spark, roll, shred, cids) > 0)
    def srcsOf(day: String) =
      graft.core.Fs.list(spark, s"$roll/date=2024-03-0$day")
        .map(_.getPath.getName)
    assert(!srcsOf("2").exists(n =>
        n == "src=batch-0" || n == "src=batch-1"),
      "the hit date's stale pre-fold dirs must be retired")
    assert(srcsOf("2").exists(_.matches("src=gen-[0-9]+c")),
      "the realign must have completed the crashed fold on the hit date")
    assert(srcsOf("1").exists(_.startsWith("src=batch-0")) &&
      !srcsOf("1").exists(_.matches("src=gen-[0-9]+c")),
      "an un-hit date must not be rewritten (work stays ∝ hits)")

    LogForget.purgeDetail(spark, log, cids)
    LogForget.purgeShred(spark, shred, cids)
    val (_, _, rollC) = mkStores("rf3c",
      all.filter(col("custom_id") =!= "user-1"))
    assert(served(roll) === served(rollC),
      "realigned rollup must equal the complement pipeline — the " +
        "banned contribution must not survive in stale dirs")

    // idempotence: a replayed re-fold over the now-aligned layout
    // changes nothing
    LogForget.refoldRollup(spark, roll, shred, cids)
    assert(served(roll) === served(rollC))
  }
}
