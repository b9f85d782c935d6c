package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class JaccardSimSpec extends SparkSpec {

  test("matches size(intersect)/size(union) bit-for-bit, incl. dups and nulls") {
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    val df = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d")),
      (Seq("a", "a", "b"), Seq("a", "b", "b")), // duplicates collapse
      (Seq("x"), Seq("y")), // disjoint
      (Seq("a", null), Seq(null, "b")), // null element on both sides
      (Seq("only"), Seq("only")))
      .toDF("a", "b").repartition(2)
    val rows = df.select(
      expr("jaccard_sim(a, b)").as("fast"),
      (size(array_intersect(col("a"), col("b"))).cast("double")
        / size(array_union(col("a"), col("b"))).cast("double")).as("ref"))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.compare(r.getDouble(0), r.getDouble(1)) == 0,
        r.toString)
    }
  }

  test("RewriteJaccard swaps the composable pattern in a real plan") {
    // over a parquet scan: a local Seq would constant-fold into a
    // LocalTableScan before the plan is observable
    GraftFunctions.ensureRegistered(spark)
    val words = split(col("text"), " ")
    val df = graft.queries.tbl(spark, sf(), "documents")
      .select(words.as("a"), reverse(words).as("b"))
      .select((size(array_intersect(col("a"), col("b"))).cast("double")
        / size(array_union(col("a"), col("b"))).cast("double")).as("jac"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("jaccard_sim"), p)
    assert(!p.contains("array_intersect"), p)
  }

  test("the near-dup queries execute with the fused kernel") {
    GraftFunctions.ensureRegistered(spark)
    val df = graft.queries.DedupQueries.ngramJaccard.spark(spark, sf())
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("jaccard_sim"))
  }
}
