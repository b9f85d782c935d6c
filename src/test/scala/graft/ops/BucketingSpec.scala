package graft.ops

import graft.SparkSpec

/** Proves the SCALE.md co-located-join claim: tables bucketed on the join
  * key join with zero Exchange operators in the physical plan — at 100 TB
  * that is the difference between a full-network shuffle and a local join.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed tables join without a shuffle") {
    import spark.implicits._
    // warehouse.dir is static; tables land in the default warehouse and
    // are dropped below
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    val orders = (1L to 1000L).map(k => (k, s"order-$k")).toDF("key", "o")
    val items = (1L to 3000L).map(i => (i % 1000 + 1, s"item-$i"))
      .toDF("key", "i")
    orders.write.mode("overwrite").bucketBy(8, "key")
      .sortBy("key").saveAsTable("orders_b")
    items.write.mode("overwrite").bucketBy(8, "key")
      .sortBy("key").saveAsTable("items_b")

    val joined = spark.table("orders_b").join(spark.table("items_b"), "key")
    joined.collect() // execute so AQE finalizes
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(joined.count() === 3000L)

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS items_b")
  }
}
