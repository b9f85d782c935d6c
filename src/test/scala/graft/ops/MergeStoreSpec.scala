package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MergeStoreSpec extends SparkSpec {

  private def tmp(): String = java.nio.file.Files
    .createTempDirectory("merge_store").toString + "/t"

  private def state(path: String): Map[Long, (Long, Double)] =
    MergeStore.read(spark, path).collect()
      .map(r => r.getAs[Long]("k") ->
        (r.getAs[Long]("seq"), r.getAs[Double]("v"))).toMap

  private def changes(rows: (Long, Long, Boolean, Double)*) = {
    import spark.implicits._
    rows.toDF("k", "seq", "is_delete", "v")
  }

  test("upsert, update, delete across batches converge to LWW state") {
    val path = tmp()
    MergeStore.merge(spark, path,
      changes((1L, 10L, false, 1.0), (2L, 11L, false, 2.0)), "k", 4)
    MergeStore.merge(spark, path,
      changes((1L, 20L, false, 1.5), (3L, 21L, false, 3.0)), "k", 4)
    MergeStore.merge(spark, path,
      changes((2L, 30L, true, 0.0)), "k", 4)
    assert(state(path) === Map(1L -> (20L, 1.5), 3L -> (21L, 3.0)))
  }

  test("replaying an old batch is a no-op (LWW + tombstones)") {
    val path = tmp()
    val b1 = changes((1L, 10L, false, 1.0), (2L, 11L, false, 2.0))
    val b2 = changes((1L, 20L, false, 1.5), (2L, 21L, true, 0.0))
    MergeStore.merge(spark, path, b1, "k", 4)
    MergeStore.merge(spark, path, b2, "k", 4)
    val after = state(path)
    assert(after === Map(1L -> (20L, 1.5)))
    // replay b1: the stale upsert must NOT resurrect deleted key 2 or
    // roll back key 1 — exactly what tombstones + stored seq guarantee
    MergeStore.merge(spark, path, b1, "k", 4)
    assert(state(path) === after)
  }

  test("merge touches only the batch's buckets; lookup prunes to one") {
    import spark.implicits._
    val path = tmp()
    MergeStore.merge(spark, path,
      changes((1L to 40L).map(i => (i, i, false, i.toDouble)): _*),
      "k", 8)
    val touched = MergeStore.merge(spark, path,
      changes((5L, 100L, false, 50.0)), "k", 8)
    val kb5 = Seq(5L).toDF("k")
      .select(pmod(xxhash64(col("k")), lit(8L))).as[Long].head()
    assert(touched === Seq(kb5))

    val look = MergeStore.lookup(spark, path, "k", 5L, 8)
    assert(look.collect().map(_.getAs[Double]("v")).toSeq === Seq(50.0))
    val plan = look.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("kb"), plan)
  }

  test("purgeTombstones drops deleted keys physically, state unchanged") {
    val path = tmp()
    MergeStore.merge(spark, path,
      changes((1L, 1L, false, 1.0), (2L, 2L, false, 2.0),
        (2L, 3L, true, 0.0)), "k", 4)
    val before = state(path)
    val rawBefore = spark.read.parquet(path).count()
    MergeStore.purgeTombstones(spark, path)
    assert(state(path) === before)
    assert(spark.read.parquet(path).count() === rawBefore - 1)
  }

  test("empty change batches never create a store; readOrEmpty degrades") {
    val path = tmp()
    val empty = changes() // zero rows, full schema
    assert(MergeStore.merge(spark, path, empty, "k", 4) === Seq.empty)
    // the store must not exist (nothing to give it a schema) …
    assert(!new java.io.File(path).exists())
    // … and the guarded read returns a typed empty frame, not a crash
    val out = MergeStore.readOrEmpty(spark, path, empty)
    assert(out.count() === 0)
    assert(out.columns.toSeq === Seq("k", "seq", "v"))
    // once a real merge lands, readOrEmpty IS read
    MergeStore.merge(spark, path, changes((1L, 1L, false, 1.0)), "k", 4)
    assert(MergeStore.readOrEmpty(spark, path, empty).count() === 1)
  }

  test("init snapshot then incremental merge equals direct merges") {
    val path = tmp()
    MergeStore.init(
      changes((1L, 1L, false, 1.0), (2L, 2L, false, 2.0)), "k", path, 4)
    MergeStore.merge(spark, path, changes((1L, 5L, false, 9.0)), "k", 4)
    assert(state(path) === Map(1L -> (5L, 9.0), 2L -> (2L, 2.0)))
  }
}
