package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.query.LogRollup
import graft.streaming.LogStreamPipeline

/** Forget a custom_id across the LOG pipeline's three stores (r13
  * verdict missing #1): detail and shred rows physically absent from
  * the raw files (not masked), the rollup's aggregates RE-FOLDED to the
  * complement (subtraction, not masking — including inside compacted
  * `_FOLDED` generations), crash+replay convergence through the Forget
  * registry, and the rollup-before-shred order contract's mask-based
  * idempotence.
  */
class LogForgetSpec extends SparkSpec {

  private def entries(n: Int, custom: Long => String): DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      val day = 1 + (i % 2) // two date partitions
      graft.core.LogEntry(
        Timestamp.valueOf(f"2024-03-0$day 10:00:${i % 60}%02d"),
        s"run-$i", "", custom(i.toLong),
        if (i % 2 == 0) "llm_end" else "llm_start",
        """{"job":"t"}""",
        s"""{"event_type":"llm_end","data":{"model":"m${i % 2}",
           |"usage_metadata":{"input_tokens":${i + 1},
           |"output_tokens":${2 * i},"total_tokens":${3 * i + 1}}}}"""
          .stripMargin.replace("\n", ""))
    }.toDF()
  }

  private def mkStores(tag: String, rows: DataFrame,
      ticks: Int = 3): (String, String, String) = {
    val base = java.nio.file.Files.createTempDirectory(tag).toString
    val (log, shred, roll) = (s"$base/log", s"$base/shred", s"$base/roll")
    LogStreamPipeline.invalidateHorizonCache()
    (0 until ticks).foreach { b =>
      LogStreamPipeline.tick(
        rows.filter(pmod(hash(col("run_id")), lit(ticks)) === b),
        b.toLong, log, shred, roll, compactEvery = 2)
    }
    (log, shred, roll)
  }

  private def rawCustomIds(dir: String): Set[String] =
    spark.read.parquet(graft.core.Fs.listDataFiles(spark, dir)
        .filter(_.endsWith(".parquet")): _*)
      .select("custom_id").distinct()
      .collect().map(_.getString(0)).toSet

  test("forgetting a custom_id physically removes its detail and " +
    "shred rows (raw-file proof, compacted generations included), " +
    "re-folds the rollup to the exact complement aggregates, and " +
    "leaves fold markers and the horizon intact") {
    val all = entries(60, i => s"${i % 5}") // custom ids "0".."4"
    val (log, shred, roll) = mkStores("lf1", all)
    val horizonBefore = LogStreamPipeline.maxFolded(spark, log)
    assert(horizonBefore >= 0, "the fixture must include a folded gen")

    import spark.implicits._
    val cids = Seq("3").toDF("custom_id")
    assert(LogForget.refoldRollup(spark, roll, shred, cids) > 0)
    assert(LogForget.purgeDetail(spark, log, cids) > 0)
    assert(LogForget.purgeShred(spark, shred, cids) > 0)

    assert(!rawCustomIds(log).contains("3"),
      "detail rows must be PHYSICALLY gone from the raw files")
    assert(!rawCustomIds(shred).contains("3"))
    assert(rawCustomIds(log).size === 4, "survivors intact")
    assert(LogStreamPipeline.maxFolded(spark, log) === horizonBefore,
      "_FOLDED markers must survive the partition swaps")

    // rollup == a from-scratch pipeline over the complement corpus
    val (_, _, rollC) =
      mkStores("lf1c", all.filter(col("custom_id") =!= "3"))
    def served(dir: String) = LogRollup.read(spark, dir, Seq("model"))
      .select("model", "n_events", "n_llm_end", "in_tokens",
        "out_tokens", "tot_tokens", "n_errors", "min_us", "max_us")
      .orderBy("model").collect().toSeq
    assert(served(roll) === served(rollC),
      "re-folded aggregates must equal the complement recompute " +
        "(subtraction, not masking)")

    // idempotence: re-running any step after the shred purge changes
    // nothing (the re-fold masks at recompute time, so it does not
    // depend on the shred rows still existing once its hit set is
    // empty)
    assert(LogForget.refoldRollup(spark, roll, shred, cids) === 0)
    assert(LogForget.purgeDetail(spark, log, cids) === 0)
    assert(served(roll) === served(rollC))
  }

  test("a crashed log purge cannot leak a half-swapped partition into " +
    "the consistency paths: readConsistent heals the marker before " +
    "pinning, and the tick's fold cadence heals before folding the " +
    "partition as a source") {
    import spark.implicits._
    val all = entries(36, i => s"${i % 3}")
    val (log, shred, roll) = mkStores("lf3", all, ticks = 3)

    // fabricate a crashed purge of custom_id "1" in one detail
    // partition: staged survivors + _PURGE marker, old files untouched
    val d = graft.core.Fs.list(spark, log)
      .filter(_.getPath.getName.startsWith("date=")).head.getPath
    val batchDir = graft.core.Fs.list(spark, d.toString)
      .filter(_.getPath.getName.matches("batch=[0-9]+")).head
      .getPath.getName
    val totalBefore = spark.read.parquet(log).count()
    val inPart = spark.read.parquet(s"$d/$batchDir")
    val dropped = inPart.filter(col("custom_id") === "1").count()
    assert(dropped > 0, "fixture partition holds no banned rows")
    PurgeFixtures.fabricateCrashedRewrite(spark, d.toString, batchDir,
      old => old.filter(col("custom_id") =!= "1"))
    assert(graft.core.Fs.list(spark, d.toString)
      .exists(_.getPath.getName.startsWith("_PURGE.")))

    // the consistent reader heals first, then pins — exact rows, no
    // torn partition, marker gone
    val view = graft.streaming.LogStreamPipeline.readConsistent(
      spark, 2L, log, shred, roll)
    assert(view.log.count() === totalBefore - dropped)
    assert(!graft.core.Fs.list(spark, d.toString)
      .exists(_.getPath.getName.startsWith("_PURGE.")),
      "readConsistent must have rolled the crashed purge forward")

    // same discipline at the fold cadence: fabricate another crash,
    // then a tick whose compactEvery fires — the fold must not absorb
    // a half-swapped source
    val batchDir2 = graft.core.Fs.list(spark, d.toString)
      .filter(_.getPath.getName.matches("batch=[0-9]+")).head
      .getPath.getName
    val dropped2 = spark.read.parquet(s"$d/$batchDir2")
      .filter(col("custom_id") === "2").count()
    PurgeFixtures.fabricateCrashedRewrite(spark, d.toString, batchDir2,
      old => old.filter(col("custom_id") =!= "2"))
    graft.streaming.LogStreamPipeline.tick(
      all.filter(pmod(hash(col("run_id")), lit(3)) === 0).limit(0),
      4L, log, shred, roll, compactEvery = 4)
    assert(!graft.core.Fs.list(spark, d.toString)
      .exists(n => n.getPath.getName.startsWith("_PURGE.") ||
        n.getPath.getName.startsWith(".purge.")),
      "the fold cadence must heal before folding")
    assert(spark.read.parquet(log).count() ===
      totalBefore - dropped - dropped2)
  }

  test("orchestrated forget with an injected crash between the " +
    "rollup re-fold and the shred purge: the ledger names the " +
    "unfinished stores, registry-free replay converges, detail " +
    "counts and rollup totals match the complement") {
    val all = entries(40, i => s"${i % 4}")
    val (log, shred, roll) = mkStores("lf2", all)
    val ledger = java.nio.file.Files.createTempDirectory("lf2l").toString

    val Seq(rollT, detailT, shredT) =
      Forget.logTargets(spark, log, shred, roll)
    val crashShred = new Forget.Target(shredT.name, shredT.kind,
      shredT.path, shredT.arg,
      _ => throw new RuntimeException("injected crash"))

    // custom_id "2" rides the orchestrator's bigint domain
    intercept[RuntimeException] {
      Forget.forget(spark, ledger, "gdpr-2", Seq(2L),
        Seq(rollT, detailT, crashShred))
    }
    assert(rawCustomIds(shred).contains("2"),
      "mid-crash: the shred store still serves the banned id")
    assert(!rawCustomIds(log).contains("2"),
      "mid-crash: the detail purge had already acked")
    val pending = Forget.status(spark, ledger,
        Seq(rollT.name, detailT.name, shredT.name))
      .filter(!col("acked")).collect().map(_.getString(1)).toSeq
    assert(pending === Seq(shredT.name))

    // process loss: replay from the ledger dir alone
    assert(Forget.replay(spark, ledger) === 1)
    assert(!rawCustomIds(shred).contains("2"))
    assert(Forget.replay(spark, ledger) === 0)

    // end state == complement pipeline, across all three stores
    val (logC, shredC, rollC) =
      mkStores("lf2c", all.filter(col("custom_id") =!= "2"))
    assert(rawCustomIds(log) === rawCustomIds(logC))
    assert(rawCustomIds(shred) === rawCustomIds(shredC))
    def served(dir: String) = LogRollup.read(spark, dir, Seq("model"))
      .select("model", "n_events", "tot_tokens")
      .orderBy("model").collect().toSeq
    assert(served(roll) === served(rollC))
  }
}
