package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class NormTextSpec extends SparkSpec {

  private def norm(s: String): String = {
    import spark.implicits._
    graft.functions.GraftFunctions.ensureRegistered(spark)
    Seq(s).toDF("t").select(expr("norm_text(t)")).head().getString(0)
  }

  test("NFC composes decomposed sequences") {
    // e + COMBINING ACUTE → é (single codepoint)
    assert(norm("é") === "é")
    // already-composed text is untouched
    assert(norm("é") === "é")
    // Hangul jamo compose to a syllable
    assert(norm("한") === "한")
  }

  test("ASCII-only lowercase: unicode case left alone") {
    assert(norm("HeLLo WORLD") === "hello world")
    // Greek capitals, dotted I, ß: deliberately NOT folded (not portable)
    assert(norm("ΣΙΣΥΦΟΣ") === "ΣΙΣΥΦΟΣ")
    assert(norm("İstanbul") === "İstanbul".replace("I", "I")) // İ kept, s..l already lower
    assert(norm("ß") === "ß")
  }

  test("whitespace runs collapse, ends trim, compatibility forms kept") {
    assert(norm("  a \t\t b\n\nc  ") === "a b c")
    assert(norm(" \t \n ") === "")
    // NFC (unlike NFKC) preserves compatibility characters: ligatures,
    // fullwidth forms — canonicalization must not rewrite content
    assert(norm("ﬁre") === "ﬁre") // ﬁre
    assert(norm("ＡＢＣ") === "ＡＢＣ")
  }

  test("null passes through and the expression stays in codegen") {
    import spark.implicits._
    val df = Seq(Some("X"), None).toDF("t")
      .select(expr("norm_text(t)").as("n"))
    assert(df.collect().map(r => Option(r.getString(0))).toSeq ===
      Seq(Some("x"), None))
    // a literal frame constant-folds to LocalTableScan; assert codegen on
    // a real scan-backed projection
    val scan = graft.queries.tbl(spark, sf(), "documents")
      .select(expr("norm_text(text)").as("n"))
    scan.collect()
    // the `*(n)` prefix marks a WholeStageCodegen stage in plan rendering
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [norm_text"), plan.take(1500))
  }
}
