package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DotProductSpec extends SparkSpec {

  test("matches the higher-order formulation bit-for-bit") {
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    val rnd = new scala.util.Random(7)
    val rows = (1 to 50).map(_ =>
      (Seq.fill(64)(rnd.nextDouble()), Seq.fill(64)(rnd.nextDouble())))
    val df = rows.toDF("a", "b").repartition(3)
    val out = df.select(
      expr("dot_product(a, b)").as("fast"),
      expr("aggregate(zip_with(a, b, (x, y) -> x * y), cast(0 as double), (acc, x) -> acc + x)")
        .as("ref")).collect()
    out.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  test("null array yields null; codegen active") {
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    val df = Seq((Some(Seq(1.0, 2.0)), None: Option[Seq[Double]]))
      .toDF("a", "b").repartition(2)
    val q = df.select(expr("dot_product(a, b)").as("d"))
    assert(q.head().isNullAt(0))
    q.collect()
    assert(q.queryExecution.executedPlan.toString.contains("*(1) Project"))
  }
}
