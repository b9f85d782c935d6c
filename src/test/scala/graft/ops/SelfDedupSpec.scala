package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SelfDedup contract: a document drops iff it shares an exact n-word
  * span with an earlier document; dup_of names the smallest such partner;
  * short and null documents are kept.
  */
class SelfDedupSpec extends SparkSpec {

  private def docs(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def mark(d: org.apache.spark.sql.DataFrame, n: Int) =
    SelfDedup.markSpans(d, "doc_id", "text", n)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getBoolean(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toMap

  test("keep-first across shared spans, embedded spans included") {
    val m = mark(docs(Seq(
      1L -> "u v w x y z tail one",
      2L -> "prefix u v w x y z",     // shares the 6-span u..z → dup of 1
      3L -> "completely different words here now ok",
      4L -> "zz u v w x y z yy",      // → dup of 1 (smallest partner)
      5L -> "u v w x q z")), n = 6)   // no shared 6-span → kept
    assert(m(1L) === (true, None))
    assert(m(2L) === (false, Some(1L)))
    assert(m(3L) === (true, None))
    assert(m(4L) === (false, Some(1L)))
    assert(m(5L) === (true, None))
  }

  test("dup_of is the smallest earlier partner over ALL shared spans") {
    val m = mark(docs(Seq(
      1L -> "a b c d e f",
      2L -> "g h i j k l",
      3L -> "g h i j k l a b c d e f")), n = 6) // shares with 1 AND 2
    assert(m(3L) === (false, Some(1L)))
  }

  test("short and null documents are kept; empty input is clean") {
    val d = docs(Seq(1L -> "a b c", 2L -> "a b c")).union(
      docs(Seq(3L -> "x")).withColumn("text", lit(null).cast("string")))
    val m = mark(d, n = 6) // all shorter than the span → no grams
    assert(m === Map(1L -> (true, None), 2L -> (true, None),
      3L -> (true, None)))
    assert(SelfDedup.markSpans(docs(Seq.empty), "doc_id", "text", 6)
      .collect().isEmpty)
  }
}
