package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** NgramLm contract: training counts, add-one-smoothed quantized scoring,
  * and the exactness invariants the oracle relies on (integer bit-cost
  * from binary string length, never a floating log).
  */
class NgramLmSpec extends SparkSpec {

  private def docs(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("training counts bigrams, contexts and vocabulary") {
    val d = docs(Seq(1L -> "a b a b c", 2L -> "a b"))
    val m = NgramLm.train(d, "doc_id", "text")
    val big = m.bigrams.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(big === Map(("a", "b") -> 3L, ("b", "a") -> 1L, ("b", "c") -> 1L))
    val ctx = m.contexts.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ctx === Map("a" -> 3L, "b" -> 2L))
    assert(m.vocab.collect().head.getLong(0) === 3L)
  }

  test("score matches the closed-form quantized bit-cost") {
    val d = docs(Seq(1L -> "a b a b c", 2L -> "a b"))
    val m = NgramLm.train(d, "doc_id", "text")
    // verify one token cost by hand: p(b|a) = (3+1)/(3+3) = 2/3;
    // q = floor(2/3 * 2^30) = 715827882; bits = 31 - bin_len(q) = 1
    def bits(c: Long, cu: Long, v: Long): Long = {
      val q = math.max(1L,
        math.floor((c + 1).toDouble / (cu + v).toDouble * NgramLm.Scale).toLong)
      31L - java.lang.Long.toBinaryString(q).length
    }
    assert(bits(3, 3, 3) === 1L)
    val scored = NgramLm.score(d, "doc_id", "text", m).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // doc 1 pairs: ab ba ab bc → bits(3,3,3)+bits(1,2,3)+bits(3,3,3)+bits(1,2,3)
    assert(scored(1L) === (4L, 2 * bits(3, 3, 3) + 2 * bits(1, 2, 3)))
    // doc 2: one ab pair
    assert(scored(2L) === (1L, bits(3, 3, 3)))
  }

  test("unseen bigrams fall through to the smoothed floor") {
    val train = docs(Seq(1L -> "a b a b"))
    val m = NgramLm.train(train, "doc_id", "text")
    // score a doc with a pair never seen in training: c=0; context 'b'
    // has cu=1 ('b a'), vocab = {a, b} → p = 1/(1+2)
    val scored = NgramLm.score(docs(Seq(9L -> "b c")), "doc_id", "text", m)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val q = math.floor(1.0 / 3.0 * NgramLm.Scale).toLong
    assert(scored(9L) === 31L - java.lang.Long.toBinaryString(q).length)
  }

  test("null and single-token documents are excluded; empty input is clean") {
    val d = docs(Seq(1L -> "a b", 2L -> "solo")) .union(
      docs(Seq(3L -> "x")).withColumn("text", lit(null).cast("string")))
    val m = NgramLm.train(d, "doc_id", "text")
    val out = NgramLm.score(d, "doc_id", "text", m).collect()
    assert(out.map(_.getLong(0)).toSet === Set(1L))
    val empty = docs(Seq.empty)
    val scoredEmpty =
      NgramLm.score(empty, "doc_id", "text", NgramLm.train(empty, "doc_id", "text"))
    assert(scoredEmpty.collect().isEmpty)
    assert(scoredEmpty.columns.toSeq ===
      Seq("doc_id", "n_bigrams", "bits_sum", "bits_per_token"))
  }
}
