package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.SubwordTokenizer

class VocabTokenizeSpec extends SparkSpec {

  private def toks(word: String, vocab: Seq[String]): Seq[String] = {
    import spark.implicits._
    SubwordTokenizer
      .tokenize(Seq(word).toDF("text"), "text", vocab)
      .select(col("toks")).collect().head.getSeq[String](0)
  }

  test("greedy longest match prefers 3-grams over 2-grams") {
    assert(toks("abcab", Seq("a", "b", "c", "ab", "abc"))
      === Seq("abc", "ab"))
  }

  test("no-match falls back to single codepoints not in vocab") {
    assert(toks("xyz", Seq("a")) === Seq("x", "y", "z"))
  }

  test("word tail shorter than probe length still matches") {
    // at pos 3 of "abcde", remaining "de": the 4-length probe yields "de"
    // which IS in vocab — must match without an explicit length guard
    assert(toks("abcde", Seq("abc", "de")) === Seq("abc", "de"))
  }

  test("surrogate pairs advance by codepoint, never split") {
    assert(toks("😀a", Seq.empty[String])
      === Seq("😀", "a"))
    assert(toks("a😀b", Seq("a😀"))
      === Seq("a😀", "b"))
  }

  test("multi-word documents flatten in order; nulls/empties clean") {
    import spark.implicits._
    val out = SubwordTokenizer.tokenize(
      Seq("ab cd", "", null).toDF("text"), "text", Seq("ab"))
      .select(col("toks")).collect()
    assert(out(0).getSeq[String](0) === Seq("ab", "c", "d"))
    assert(out(1).getSeq[String](0) === Seq.empty[String])
    assert(out(2).isNullAt(0))
  }

  test("trained vocab is total-ordered and covers all singles") {
    import spark.implicits._
    val docs = Seq("aaab aaab", "aaab xy").toDF("text")
    val vocab = SubwordTokenizer.trainVocab(docs, "text", 2)
    // top-2 grams by (count desc, gram asc): "aa" (6), then "aaa" (3)
    // beats "aab"/"ab" (3 each) lexicographically
    assert(vocab.contains("aa") && vocab.contains("aaa"))
    assert(Seq("a", "b", "x", "y").forall(vocab.contains))
    assert(!vocab.contains("xy"))
  }
}
