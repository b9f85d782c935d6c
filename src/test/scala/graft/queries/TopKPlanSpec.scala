package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The rank-window top-k idiom (`rank().over(partitionBy(g).orderBy(o))
  * .filter(rnk <= k)`, used by q_top_customers) must hit Spark's
  * WindowGroupLimit rewrite: a PARTIAL group-limit runs BEFORE the
  * shuffle with O(k) state per group, so each map task forwards at most
  * k rows per group instead of shipping and sorting the full input.
  * That is exactly the bounded-heap top-k a 100 TB plan needs — if a
  * Spark upgrade or a query rewrite ever knocks the pattern out of the
  * optimization (e.g. by adding a non-rank window in the same select,
  * or ranking on a non-deterministic key), this spec fails rather than
  * the cluster melting.
  */
class TopKPlanSpec extends SparkSpec {
  import spark.implicits._

  test("rank-limit window compiles to a partial WindowGroupLimit below " +
    "the shuffle, and q_top_customers' plan carries it") {
    val df = spark.range(0, 10000).toDF("id")
      .withColumn("g", col("id") % 7)
      .withColumn("v", col("id") * 37 % 1000)
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id"))
    val topk = df.withColumn("rnk", rank().over(w)).filter(col("rnk") <= 3)
    val plan = topk.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
    // partial mode = the map-side bounded pass before the exchange
    assert(plan.contains("Partial"), plan)
    assert(topk.count() === 21L)

    val q = Registry.all.find(_.name == "q_top_customers").get
    val qplan = q.spark(spark, sf()).queryExecution.executedPlan.toString
    assert(qplan.contains("WindowGroupLimit"), qplan)
    assert(qplan.contains("Partial"), qplan)
  }
}
