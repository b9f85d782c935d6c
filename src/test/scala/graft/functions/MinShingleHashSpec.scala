package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MinShingleHashSpec extends SparkSpec {

  test("matches array_min(transform(md5num(concat_ws))) bit-for-bit") {
    GraftFunctions.ensureRegistered(spark)
    val df = graft.queries.tbl(spark, sf(), "documents")
      .select(split(col("text"), " ").as("w"), col("text"))
      .filter(size(col("w")) >= 5)
    val rows = df.select(
      expr("min_shingle_hash(w, 5)").as("fast"),
      expr("""array_min(transform(sequence(1, size(w) - 4),
               i -> md5num(concat_ws(' ', slice(w, i, 5)))))""").as("ref"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1), r.toString))
  }

  test("null under n words; single-shingle degenerate equals md5num") {
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    val r = Seq(("a b c d", "a b c d e"))
      .toDF("short", "exact5")
      .select(
        expr("min_shingle_hash(split(short, ' '), 5)").as("s"),
        expr("min_shingle_hash(split(exact5, ' '), 5)").as("e"),
        expr("md5num(exact5)").as("m"))
      .head()
    assert(r.isNullAt(0))
    assert(r.getLong(1) === r.getLong(2))
  }
}
