package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class GlobalRankSpec extends SparkSpec {

  private def rev = graft.queries.tbl(spark, sf(), "orders")
    .groupBy("o_custkey")
    .agg(sum(col("o_totalprice")).as("revenue"))

  test("distributed row number equals the single-partition window form") {
    val order = Seq(col("revenue").desc, col("o_custkey"))
    val viaWindow = rev
      .withColumn("rn", row_number().over(
        Window.orderBy(col("revenue").desc, col("o_custkey"))).cast("long"))
      .select("o_custkey", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val viaRank = GlobalRank.withRowNumber(rev, order)
      .select("o_custkey", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(viaRank === viaWindow)
    assert(viaRank.nonEmpty)
  }

  test("distributed running total equals the single-partition window cumsum") {
    val toks = graft.queries.tbl(spark, sf(), "documents")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("tokens"))
    val order = Seq(col("tokens"), col("doc_id"))
    val viaWindow = toks
      .withColumn("ct", sum("tokens").over(
        Window.orderBy(col("tokens"), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("doc_id", "ct").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val df = GlobalRank.withRunningTotal(toks, order, "tokens", "ct")
    val viaRank = df.select("doc_id", "ct").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(viaRank === viaWindow)
    assert(viaRank.nonEmpty)
    assert(!df.queryExecution.executedPlan.toString.contains("Window"),
      "distributed running total must not plan a window")
  }

  test("distributed ntile matches SQL NTILE and plans no Window operator") {
    val order = Seq(col("revenue").desc, col("o_custkey"))
    val viaWindow = rev
      .withColumn("q", ntile(4).over(
        Window.orderBy(col("revenue").desc, col("o_custkey"))).cast("long"))
      .select("o_custkey", "q").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val df = GlobalRank.ntile(rev, order, 4, "q")
    val viaRank = df.select("o_custkey", "q").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(viaRank === viaWindow)
    assert(!df.queryExecution.executedPlan.toString.contains("Window"),
      "distributed ntile must not plan a window")
  }
}
