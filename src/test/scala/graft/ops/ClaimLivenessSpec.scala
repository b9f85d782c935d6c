package graft.ops

import java.util.concurrent.{ConcurrentHashMap, CountDownLatch, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Fs

/** Claim liveness for multi-maintainer [[ClusteredStore]]s: a crashed
  * maintainer's claim no longer blocks every successor until a manual
  * `recover` — a claimant that opts in with `staleClaimMs` breaks a
  * claim that is (a) older than the threshold AND (b) uncommitted, and
  * the presumed-dead maintainer, if it was merely slow, refuses at its
  * OWN commit point (token lease re-verified) instead of
  * double-committing. Plus the sustained two-writer soak: refusal +
  * retry converges with a gap-free version history and no lost update.
  */
class ClaimLivenessSpec extends SparkSpec {
  import spark.implicits._

  private def mkDocs(ids: Range) =
    ids.toDF("id")
      .withColumn("a", col("id").cast("long") * 7919 % 1000)
      .withColumn("b", col("id").cast("long") * 104729 % 1000)
      .withColumn("payload", concat(lit("row"), col("id")))

  test("a second maintainer takes over a stalled one's claim without " +
    "manual recover; the stalled one refuses at commit — no lost " +
    "update, no double commit") {
    val dir = java.nio.file.Files.createTempDirectory("cliveness1").toString
    ClusteredStore.init(mkDocs(0 until 3000), Seq("a", "b"), 4, dir)

    // maintainer A's incoming batch parks its (single) task on a latch:
    // A claims v=2, then hangs mid-flight exactly like a dead executor
    val stalled = spark.range(900000L, 900050L, 1L, 1)
      .map { i => ClaimLivenessSpec.gate.await(120, TimeUnit.SECONDS); i }
      .select(col("value").cast("int").as("id"))
      .withColumn("a", col("id").cast("long") % 100)
      .withColumn("b", col("id").cast("long") % 100)
      .withColumn("payload", lit("stalled"))
    val results = new ConcurrentHashMap[String, String]()
    val a = new Thread(() =>
      try {
        ClusteredStore.append(spark, dir, stalled)
        results.put("A", "committed")
      } catch {
        case _: ConcurrentCommitException => results.put("A", "refused")
        case t: Throwable => results.put("A", s"error: $t")
      })
    a.start()
    val deadline = System.currentTimeMillis() + 30000
    while (!Fs.exists(spark, s"$dir/ledger/claim-v=2") &&
      System.currentTimeMillis() < deadline) Thread.sleep(20)
    assert(Fs.exists(spark, s"$dir/ledger/claim-v=2"), "A never claimed")

    // let A's claim age past B's staleness threshold (no heartbeat — A
    // is stuck before its staging pass, where the built-ins heartbeat)
    Thread.sleep(800)
    val sB = ClusteredStore.append(spark, dir,
      mkDocs(800000 until 800080).withColumn("payload", lit("takeover")),
      staleClaimMs = 500L)
    assert(sB.version === 2, s"takeover must commit v2: $sB")

    // unblock A: it finishes its work, then must REFUSE at the commit
    // point (its token is gone from the claim file) — never overwrite
    ClaimLivenessSpec.gate.countDown()
    a.join(60000)
    assert(results.get("A") === "refused", s"$results")

    // no lost update, no double commit, no adopted orphans
    assert(ClusteredStore.currentVersion(spark, dir) === Some(2))
    val snap = ClusteredStore.read(spark, dir)
    assert(snap.filter(col("payload") === "takeover").count() === 80L)
    assert(snap.filter(col("payload") === "stalled").count() === 0L)
    assert(snap.count() === 3080L)
    // A's staged leftovers are ordinary orphans: vacuum reclaims them
    ClusteredStore.vacuum(spark, dir, keepLast = 1)
    val onDisk = Fs.list(spark, s"$dir/data").map(_.getPath.getName)
      .filterNot(_.startsWith("_")).toSet
    val listed = ClusteredStore.manifest(spark, dir).select("file")
      .collect()
      .map(r => new org.apache.hadoop.fs.Path(r.getString(0)).getName).toSet
    assert(onDisk === listed, s"stranded: ${onDisk.diff(listed)}")
    // and A can simply retry now
    val retry = ClusteredStore.append(spark, dir,
      mkDocs(900000 until 900050).withColumn("payload", lit("retry")))
    assert(retry.version === 3)
    assert(ClusteredStore.read(spark, dir).count() === 3130L)
  }

  test("a FRESH claim is never broken (liveness threshold respected); a " +
    "backdated one is, and the breaker clears the dead attempt's " +
    "markerless manifest dir and dangling model version first") {
    val dir = java.nio.file.Files.createTempDirectory("cliveness2").toString
    ClusteredStore.init(mkDocs(0 until 2000), Seq("a", "b"), 2, dir)
    // a crashed recluster's leavings: claim + self-_SUCCESS'd model dir
    // + markerless manifest dir at v=2
    val claim = java.nio.file.Paths.get(s"$dir/ledger/claim-v=2")
    java.nio.file.Files.write(claim, "deadbeef".getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE_NEW)
    mkDocs(0 until 1).write.parquet(s"$dir/model/v=2")
    mkDocs(0 until 1).write.parquet(s"$dir/ledger/v=2")
    Fs.delete(spark, s"$dir/ledger/v=2/_SUCCESS")

    // fresh claim (mtime = now): even a takeover-enabled maintainer
    // refuses — the holder might be alive and mid-work
    val e = intercept[ConcurrentCommitException](
      ClusteredStore.append(spark, dir, mkDocs(5000 until 5010),
        staleClaimMs = 600000L))
    assert(e.getMessage.contains("claimed"))
    assert(Fs.exists(spark, s"$dir/model/v=2"),
      "a refused takeover must not touch the holder's state")

    // backdate the claim past the threshold: takeover proceeds, debris
    // (dangling model, markerless manifest) cleared BEFORE the commit
    java.nio.file.Files.setLastModifiedTime(claim,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 60000))
    val st = ClusteredStore.append(spark, dir, mkDocs(5000 until 5010),
      staleClaimMs = 30000L)
    assert(st.version === 2)
    assert(!Fs.exists(spark, s"$dir/model/v=2"),
      "dangling model version must not survive the takeover — a later " +
        "loadModel would silently adopt bounds the data was never laid " +
        "out under")
    assert(Fs.exists(spark, s"$dir/ledger/v=2/_SUCCESS"))
    assert(ClusteredStore.read(spark, dir).count() === 2010L)
  }

  test("sustained two-writer contention: refuse-and-retry converges, the " +
    "version history is gap-free, every committed batch lands exactly " +
    "once") {
    val dir = java.nio.file.Files.createTempDirectory("cliveness3").toString
    ClusteredStore.init(mkDocs(0 until 2000), Seq("a", "b"), 4, dir)
    val perWriter = 20
    val refusals = new AtomicInteger(0)
    val errors = new ConcurrentHashMap[String, Throwable]()
    def writer(tag: String, base: Int) = new Thread(() => {
      var k = 0
      try while (k < perWriter) {
        val delta = ((base + k * 100) until (base + k * 100 + 25)).toDF("id")
          .withColumn("a", col("id").cast("long") % 1000)
          .withColumn("b", col("id").cast("long") % 997)
          .withColumn("payload", lit(s"$tag$k"))
        try { ClusteredStore.append(spark, dir, delta); k += 1 }
        catch {
          case _: ConcurrentCommitException =>
            refusals.incrementAndGet()
            Thread.sleep(25) // losers back off; a hot retry loop just
            // hammers the claim file while the winner works
        }
      } catch { case t: Throwable => errors.put(tag, t) }
    })
    val t0 = System.nanoTime()
    val w1 = writer("L", 100000)
    val w2 = writer("R", 200000)
    w1.start(); w2.start(); w1.join(300000); w2.join(300000)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(errors.isEmpty, s"$errors")

    // gap-free history: exactly init + 2×perWriter commits, no skips
    val versions = ClusteredStore.history(spark, dir)
      .select("version").collect().map(_.getInt(0)).sorted.toSeq
    assert(versions === (1 to (1 + 2 * perWriter)),
      s"version history has gaps: $versions")
    // no lost update, no double-applied batch
    val snap = ClusteredStore.read(spark, dir)
    assert(snap.count() === 2000L + 2L * perWriter * 25)
    val perTag = snap.filter(col("payload").startsWith("L") ||
        col("payload").startsWith("R"))
      .groupBy("payload").count().collect()
    assert(perTag.length === 2 * perWriter)
    perTag.foreach(r => assert(r.getLong(1) === 25L,
      s"${r.getString(0)} applied ${r.getLong(1)} times"))
    info(f"2 writers × $perWriter commits in $secs%.1f s, " +
      f"${refusals.get()} refusals (${refusals.get() * 100.0 /
        (2 * perWriter + refusals.get())}%.0f%% of attempts)")
  }
}

object ClaimLivenessSpec {
  /** Parks maintainer A's task mid-append (shared in-JVM under local
    * mode; accessed statically, so the closure stays serializable).
    */
  val gate = new CountDownLatch(1)
}
