package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Fs

/** The stale-claim-on-a-committed-version guard (r11 advice): a
  * maintainer's claim target is derived from a currentVersion read
  * taken BEFORE its driver-side prep (upsert key collection, DV hit
  * scans — deliberately long). If another maintainer commits that
  * version in the window AND a vacuum/recover sweeps the winner's
  * SPENT claim file, the slow maintainer's claim-create succeeds on a
  * version that is no longer free — and its commit would
  * mode(overwrite) the committed manifest, silently losing the
  * winner's update. claimOrThrow now refuses (releasing the claim)
  * whenever a manifest at or past the claimed version is committed;
  * commitManifest carries a second-line `_SUCCESS` check for the
  * residual claim-to-commit window.
  */
class StaleClaimGuardSpec extends SparkSpec {
  import spark.implicits._

  private def mkDocs(ids: Range) =
    ids.toDF("id")
      .withColumn("a", col("id").cast("long") * 7919 % 1000)
      .withColumn("b", col("id").cast("long") * 104729 % 1000)
      .withColumn("payload", concat(lit("row"), col("id")))

  test("a maintainer whose claim target committed while it prepared " +
    "(the winner's spent claim already swept by recover) refuses at " +
    "claim time — the committed manifest is never overwritten, and a " +
    "retry lands cleanly on the next version") {
    val dir = java.nio.file.Files.createTempDirectory("staleclaim1").toString
    ClusteredStore.init(mkDocs(0 until 500), Seq("a", "b"), 2, dir)

    // between the slow maintainer's currentVersion read and its claim:
    // an interleaved maintainer commits v=2, and recover sweeps the
    // spent claim-v=2 — the exact state that used to let the slow one
    // claim (and later clobber) the committed version
    @volatile var armed = true
    ClusteredStore.onPreClaim = () => {
      if (armed) {
        armed = false // self-clear: the inner maintainer claims too
        ClusteredStore.append(spark, dir,
          mkDocs(600 until 700).withColumn("payload", lit("winner")))
        ClusteredStore.recover(spark, dir)
        assert(!Fs.exists(spark, s"$dir/ledger/claim-v=2"),
          "setup: the spent claim must be swept for the race to arm")
      }
    }
    val e =
      try intercept[ConcurrentCommitException](
        ClusteredStore.append(spark, dir,
          mkDocs(800 until 810).withColumn("payload", lit("loser"))))
      finally ClusteredStore.onPreClaim = () => ()
    assert(e.getMessage.contains("committed while this maintainer"),
      e.getMessage)

    // the winner's commit is fully intact — nothing was overwritten
    assert(ClusteredStore.currentVersion(spark, dir) === Some(2))
    val snap = ClusteredStore.read(spark, dir)
    assert(snap.count() === 600L)
    assert(snap.filter(col("payload") === "winner").count() === 100L)
    assert(snap.filter(col("payload") === "loser").count() === 0L)

    // the refused maintainer RELEASED its claim: a plain retry derives
    // the new current version and commits as v=3
    val retry = ClusteredStore.append(spark, dir,
      mkDocs(800 until 810).withColumn("payload", lit("retry")))
    assert(retry.version === 3)
    assert(ClusteredStore.read(spark, dir).count() === 610L)
  }
}
