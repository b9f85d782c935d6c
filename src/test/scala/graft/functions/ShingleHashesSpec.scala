package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ShingleHashesSpec extends SparkSpec {

  test("matches array_distinct(transform(md5num(concat_ws))) bit-for-bit, " +
    "order included") {
    GraftFunctions.ensureRegistered(spark)
    val rows = graft.queries.tbl(spark, sf(), "documents")
      .select(split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 5)
      .select(
        expr("shingle_hashes(w, 5)").as("fast"),
        expr("""array_distinct(transform(sequence(1, size(w) - 4),
                 i -> md5num(concat_ws(' ', slice(w, i, 5)))))""").as("ref"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1), r.toString))
  }

  test("short input yields an empty array; duplicates collapse") {
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    val r = Seq(("a b c d", "x y x y x y x"))
      .toDF("short", "cyclic")
      .select(
        expr("shingle_hashes(split(short, ' '), 5)").as("s"),
        expr("shingle_hashes(split(cyclic, ' '), 2)").as("c"))
      .head()
    assert(r.getSeq[Long](0).isEmpty)
    // bigrams of the period-2 cycle: only "x y" and "y x"
    assert(r.getSeq[Long](1).length === 2)
  }
}
