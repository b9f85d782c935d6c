package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsOfJoinNativeSpec extends SparkSpec {

  private def events = graft.queries.tbl(spark, sf(), "events")
    .select(col("event_id"), col("user_id"), col("event_type"),
      col("value"), expr("ts div 1000").as("tus"))

  test("native sort-merge as-of equals the union+window implementation") {
    val clicks = events.filter(col("event_type") === "click")
      .select("event_id", "user_id", "tus")
    val purchases = events.filter(col("event_type") === "purchase")
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("user_id", "tus").orderBy(col("event_id").desc)))
      .filter(col("__rn") === 1)
      .select(col("user_id"), col("tus"),
        col("event_id").as("purchase_id"), col("value").as("purchase_value"))

    def normalize(df: org.apache.spark.sql.DataFrame) =
      df.select(col("event_id"), col("asof_purchase_id"),
        col("asof_purchase_value")).orderBy("event_id").collect().toSeq

    val viaWindow = normalize(graft.ops.AsOfJoin.asOf(
      clicks, purchases, "user_id", "tus", Seq("purchase_id", "purchase_value")))
    val viaNative = normalize(AsOfJoinNative.asOf(
      clicks, purchases, "user_id", "tus", Seq("purchase_id", "purchase_value")))
    assert(viaNative.nonEmpty)
    assert(viaNative === viaWindow)
  }

  test("the physical plan contains the custom operator and shuffles both sides") {
    val clicks = events.filter(col("event_type") === "click")
      .select("event_id", "user_id", "tus")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("tus"), col("event_id").as("pid"))
    val df = AsOfJoinNative.asOf(clicks, purchases, "user_id", "tus", Seq("pid"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the Exec suffix
    assert(p.contains("AsOfJoin "), p.take(3000))
    assert(p.contains("Exchange hashpartitioning"), p.take(3000))
  }

  test("edge cases: empty right, null keys, equal timestamps are inclusive") {
    import spark.implicits._
    val left = Seq(
      (1L, java.lang.Long.valueOf(10L), 100L),
      (2L, java.lang.Long.valueOf(10L), 200L),
      (3L, null.asInstanceOf[java.lang.Long], 150L), // null key: no match
      (4L, java.lang.Long.valueOf(20L), 50L))
      .toDF("id", "k", "t")
    val right = Seq(
      (java.lang.Long.valueOf(10L), 100L, "at-100"), // equal ts matches (inclusive)
      (java.lang.Long.valueOf(10L), 180L, "at-180"),
      (null.asInstanceOf[java.lang.Long], 1L, "null-key"),
      (java.lang.Long.valueOf(20L), 60L, "too-late"))
      .toDF("k", "t", "tag")
    val out = AsOfJoinNative.asOf(left, right, "k", "t", Seq("tag"))
      .orderBy("id").collect()
    assert(out.map(r => Option(r.getString(3)).orNull).toSeq ===
      Seq("at-100", "at-180", null, null))

    val emptyRight = right.filter(lit(false))
    val out2 = AsOfJoinNative.asOf(left, emptyRight, "k", "t", Seq("tag"))
      .orderBy("id").collect()
    assert(out2.length === 4)
    assert(out2.forall(_.isNullAt(3)))
  }
}
