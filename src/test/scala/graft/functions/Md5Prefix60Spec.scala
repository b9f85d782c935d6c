package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class Md5Prefix60Spec extends SparkSpec {

  test("matches the composable conv(substr(md5)) formula bit-for-bit") {
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    val df = Seq("", "a", "hello world", "the quick brown fox", "äöü ✓")
      .toDF("s").repartition(2)
    val rows = df.select(
      expr("md5num(s)").as("fast"),
      expr("cast(conv(substr(md5(s), 1, 15), 16, 10) as bigint)").as("ref"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1), r.toString))
    assert(rows.map(_.getLong(0)).distinct.length === rows.length)
  }

  test("known value parity with DuckDB formula") {
    // ('0x' || substr(md5('hello'),1,15))::BIGINT = 419982666956583591
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    val v = Seq("hello").toDF("s").select(expr("md5num(s)")).head().getLong(0)
    assert(v === 419982666956583591L)
  }

  test("stays in whole-stage codegen and handles nulls") {
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    val df = Seq(Some("x"), None).toDF("s").repartition(2)
    val out = df.select(expr("md5num(s)").as("h")).collect()
    assert(out.count(_.isNullAt(0)) === 1)
    val qdf = df.repartition(2).select(expr("md5num(s)"))
    qdf.collect()
    assert(qdf.queryExecution.executedPlan.toString.contains("*(1) Project"))
  }
}
