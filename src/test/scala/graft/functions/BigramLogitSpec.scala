package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BigramLogitSpec extends SparkSpec {

  private val mix = 2654435761L
  private def weights(d: Int): Array[Double] =
    Array.tabulate(d)(f => ((f.toLong * mix) % 2001 - 1000) / 1000.0)

  test("matches the composable aggregate-fold form bit-for-bit") {
    GraftFunctions.ensureRegistered(spark)
    val rows = graft.queries.tbl(spark, sf(), "documents")
      .select(split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 2)
      .select(
        call_function("bigram_logit", col("w"), typedLit(weights(1024)))
          .as("fast"),
        (expr(s"""aggregate(
             transform(sequence(1, size(w) - 1),
                       i -> md5num(concat_ws(' ', w[i-1], w[i])) % 1024),
             cast(0.0 as double),
             (acc, f) -> acc + ((f * ${mix}L) % 2001 - 1000) / 1000.0)""")
          / (size(col("w")) - 1)).as("ref"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)), r.toString)
    }
  }

  test("null for documents with fewer than two words") {
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    val r = Seq(("solo"))
      .toDF("t")
      .select(call_function(
        "bigram_logit", split(col("t"), " "), typedLit(weights(8))).as("l"))
      .head()
    assert(r.isNullAt(0))
  }
}
