package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class CharGramCountsSpec extends SparkSpec {

  /** Corpus-level gram totals through the native kernel. */
  private def viaKernel(docs: DataFrame): Map[String, Long] = {
    GraftFunctions.ensureRegistered(spark)
    docs
      .select(explode(expr("char_gram_counts(split(text, ' '))")).as("gc"))
      .groupBy(col("gc.g").as("g")).agg(sum("gc.c").as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  /** The per-occurrence formulation the DuckDB oracle replays: explode
    * every gram occurrence of every word, then count.
    */
  private def viaExplode(docs: DataFrame): Map[String, Long] = {
    docs
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .select(explode(expr(
        """flatten(transform(sequence(1, 4), n ->
             if(length(word) >= n,
                transform(sequence(1, length(word) - n + 1),
                          i -> substring(word, i, n)),
                array_remove(array(''), ''))))""")).as("g"))
      .groupBy("g").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("kernel totals equal the exploded per-occurrence formulation") {
    import spark.implicits._
    val docs = Seq(
      "aaab aaab xy", "the quick brown fox", "a", "", "aa aa aa")
      .toDF("text")
    assert(viaKernel(docs) === viaExplode(docs))
  }

  test("codepoint grams: multi-byte and surrogate pairs never split") {
    import spark.implicits._
    // substring()/length() are codepoint-based in Spark SQL, so the
    // exploded formulation is the codepoint ground truth here too
    val docs = Seq("héllo wörld", "😀ab c😀d", "日本語テスト").toDF("text")
    val k = viaKernel(docs)
    assert(k === viaExplode(docs))
    assert(k("😀a") === 1L && k("日本") === 1L)
    // every gram is well-formed UTF-16: a high surrogate is always
    // followed by a low one and vice versa (no split pairs)
    k.keys.foreach { g =>
      var i = 0
      while (i < g.length) {
        if (Character.isHighSurrogate(g.charAt(i))) {
          assert(i + 1 < g.length && Character.isLowSurrogate(g.charAt(i + 1)),
            s"split surrogate in gram ${g.toList}")
          i += 2
        } else {
          assert(!Character.isLowSurrogate(g.charAt(i)),
            s"lone low surrogate in gram ${g.toList}")
          i += 1
        }
      }
    }
  }

  test("null documents and empty words are clean") {
    import spark.implicits._
    val docs = Seq(Some("ab  cd"), None, Some("")).toDF("text")
    // double space → empty word element; null text row drops via the
    // caller's isNotNull filter (trainVocab) — here exercise the kernel's
    // own null-element path directly
    GraftFunctions.ensureRegistered(spark)
    val out = docs.filter(col("text").isNotNull)
      .select(expr("char_gram_counts(split(text, ' '))").as("a"))
      .collect()
    assert(out.length === 2)
    assert(viaKernel(docs.filter(col("text").isNotNull)) ===
      viaExplode(docs.filter(col("text").isNotNull)))
  }
}
