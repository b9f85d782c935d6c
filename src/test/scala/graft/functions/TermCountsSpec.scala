package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TermCountsSpec extends SparkSpec {

  test("explode(term_counts) equals explode(words) → groupBy(doc, term)") {
    GraftFunctions.ensureRegistered(spark)
    val docs = graft.queries.tbl(spark, sf(), "documents")
      .select(col("doc_id"), col("text"))
    val viaKernel = docs
      .select(col("doc_id"),
        explode(expr("term_counts(split(text, ' '))")).as("tc"))
      .select(col("doc_id"), col("tc.term"), col("tc.tf"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val viaShuffle = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(viaKernel.nonEmpty)
    assert(viaKernel === viaShuffle)
  }

  test("empty array and null words degrade cleanly") {
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    val r = Seq(("", "a a b"))
      .toDF("empty", "dups")
      .select(
        expr("term_counts(split(empty, ' '))").as("e"),
        expr("term_counts(split(dups, ' '))").as("d"))
      .head()
    // split("") yields [""], one empty-string term with tf 1
    assert(r.getSeq[org.apache.spark.sql.Row](0).length === 1)
    val d = r.getSeq[org.apache.spark.sql.Row](1)
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(d === Map("a" -> 2L, "b" -> 1L))
  }
}
