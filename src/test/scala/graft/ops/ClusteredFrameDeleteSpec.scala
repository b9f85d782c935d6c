package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Frame-shaped copy-on-write delete on the primary store (r14 verdict
  * wrong #1 — the one forget target that defeated the >64Ki-id staged-
  * frame scale path by collect()ing the whole set to the driver):
  * [[ClusteredStore.deleteKeysFrame]] takes the key set as a DataFrame
  * and keeps it distributed end to end, and [[Forget.clusteredTarget]]
  * routes past [[ClusteredStore.DvBroadcastMaxKeys]] to it instead of
  * the Seq-shaped DV delete.
  */
class ClusteredFrameDeleteSpec extends SparkSpec {

  private def mkStore(tag: String, n: Long): String = {
    val dir = java.nio.file.Files.createTempDirectory(tag).toString
    val df = spark.range(0, n)
      .select(col("id").as("k"), (col("id") * 7 % 100).as("v"),
        concat(lit("p"), col("id")).as("payload"))
    ClusteredStore.init(df, Seq("k", "v"), 8, dir,
      bloomCols = Seq("k"))
    dir
  }

  test("deleteKeysFrame: distributed key frame, only hit files " +
    "rewritten, survivors identical to the Seq-shaped DV path, " +
    "idempotent on a missing key set") {
    val dir = mkStore("cfd1", 3000L)
    // keys 1000..4999: 2000 real hits (1000..2999), 2000 misses
    val keys = spark.range(1000, 5000).select(col("id").as("k"))
    val stats = ClusteredStore.deleteKeysFrame(spark, dir, "k", keys)
    assert(stats.deleted === 2000L)
    assert(stats.rewritten > 0 && stats.untouched >= 0)

    val alive = ClusteredStore.read(spark, dir)
    assert(alive.count() === 1000L)
    assert(alive.agg(max("k")).head().getLong(0) === 999L)
    // physically gone from the raw files, not masked: no DV manifest
    // entries exist (copy-on-write wrote survivor files)
    val man = ClusteredStore.manifest(spark, dir)
    if (man.columns.contains("dv_rows"))
      assert(man.filter(col("dv_rows") > 0).count() === 0,
        "the frame path must rewrite, never mask")

    // equivalence with the small Seq-shaped path on a twin store
    val twin = mkStore("cfd1t", 3000L)
    ClusteredStore.deleteKeys(spark, twin, "k", (1000L until 3000L))
    val a = ClusteredStore.read(spark, dir)
      .select("k", "v", "payload").orderBy("k").collect().toSeq
    val b = ClusteredStore.read(spark, twin)
      .select("k", "v", "payload").orderBy("k").collect().toSeq
    assert(a === b)

    // an all-miss frame is a version-preserving no-op
    val v = ClusteredStore.currentVersion(spark, dir).get
    val noop = ClusteredStore.deleteKeysFrame(spark, dir, "k",
      spark.range(500000, 500100).select(col("id").as("k")))
    assert(noop.deleted === 0L && noop.rewritten === 0)
    assert(ClusteredStore.currentVersion(spark, dir).get === v,
      "a no-hit delete must not burn a manifest version")
  }

  test("Forget.clusteredTarget routes a past-DvBroadcastMaxKeys " +
    "request to the frame path (no driver collect, no DV mask) with " +
    "answers identical to the complement") {
    assume(ClusteredStore.DvBroadcastMaxKeys <= (1L << 20),
      "spec sized against the documented 1Mi bound")
    val dir = mkStore("cfd2", 2000L)
    val ledger = java.nio.file.Files.createTempDirectory("cfd2l").toString
    val n = ClusteredStore.DvBroadcastMaxKeys + 1000
    // a staged-frame-sized request: every store key k >= 1000 is banned
    // plus ~1M misses — the routing check (limit+count) must pick the
    // frame path, and the ledger must pin a staged frame, not an array
    val ids = spark.range(1000, 1000 + n).select(col("id").as("_fg_id"))
    val t = Forget.clusteredTarget(spark, dir, "k")
    Forget.forgetFrame(spark, ledger, "big-primary", Some(ids), Seq(t))

    assert(graft.core.Fs.nonEmptyDir(spark, s"$ledger/_ids"),
      "past RequestPinMaxIds the ids must have staged as a frame")
    val alive = ClusteredStore.read(spark, dir)
    assert(alive.count() === 1000L)
    assert(alive.agg(max("k")).head().getLong(0) === 999L)
    val man = ClusteredStore.manifest(spark, dir)
    if (man.columns.contains("dv_rows"))
      assert(man.filter(col("dv_rows") > 0).count() === 0,
        "the big route must be copy-on-write (deleteKeysFrame), not a " +
          "driver-collected DV mask")
    // the ack records the store's real hit count
    val st = Forget.status(spark, ledger, Seq(t.name)).collect()
    assert(st.length === 1 && st.head.getBoolean(2))
    assert(st.head.getLong(3) === 1000L)
  }
}
