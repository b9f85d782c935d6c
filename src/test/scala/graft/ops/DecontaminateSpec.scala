package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Decontamination contract: pairs are exact-Jaccard-verified band
  * collisions across the corpus/eval split, clean() removes exactly the
  * contaminated ids, and the corpus side never shuffles (eval broadcast,
  * verify map-side; the only exchange is the pair-level distinct).
  */
class DecontaminateSpec extends SparkSpec {
  import graft.queries.tbl

  private def docs = tbl(spark, sf(), "documents")
  private def corpus = docs.filter(col("doc_id") % 7 =!= 0)
  private def evalSet = docs.filter(col("doc_id") % 7 === 0)

  test("pairs cross the split and carry verified jaccard >= threshold") {
    val rows = Decontaminate.pairs(corpus, evalSet, "doc_id", "text")
      .collect()
    assert(rows.nonEmpty, "sf0.001 corpus should contain cross-split near-dups")
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("doc_id")) % 7 != 0, s"corpus side: $r")
      assert(r.getLong(r.fieldIndex("eval_id")) % 7 == 0, s"eval side: $r")
      assert(r.getDouble(r.fieldIndex("jaccard")) >= 0.5, s"threshold: $r")
    }
    // pair-level dedup happened: one row per (doc, eval) pair
    val keys = rows.map(r => (r.getLong(0), r.getLong(1)))
    assert(keys.distinct.length === keys.length)
  }

  test("clean removes exactly the contaminated doc ids, nothing else") {
    val dirty = Decontaminate.pairs(corpus, evalSet, "doc_id", "text")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    val kept = Decontaminate.clean(corpus, evalSet, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val all = corpus.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === all.diff(dirty))
    assert(dirty.nonEmpty && kept.nonEmpty)
  }

  test("exactGramHits counts distinct shared n-grams per corpus doc") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "a b c d e f"),       // grams {a b c d e, b c d e f}; 1 hit
      (2L, "x y z w q r s"),     // no shared gram
      (3L, "b c d e f g b c d e f g")) // dup grams collapse: distinct hits
      .toDF("doc_id", "text")
    val evalSet = Seq((100L, "u u u b c d e f u u")).toDF("doc_id", "text")
    val rows = Decontaminate
      .exactGramHits(corpus, evalSet, "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(rows.keySet === Set(1L, 3L))
    assert(rows(1L) === ((2L, 1L, 0.5)))
    // doc 3: 8 windows over the period-6 word cycle → 6 distinct grams,
    // 1 of them shared
    assert(rows(3L)._1 === 6L && rows(3L)._2 === 1L)
  }

  test("exactGramHits plan: eval grams broadcast; corpus-side shuffle " +
    "carries only matched (doc, gram) pairs into the count agg") {
    val plan = Decontaminate
      .exactGramHits(corpus, evalSet, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    // two non-broadcast exchanges: the (tiny) eval-gram distinct and the
    // per-doc hit-count aggregation over matches — the corpus itself
    // reaches the broadcast probe straight from its scan
    val shuffles = plan.linesIterator
      .count(l => l.contains("Exchange") && !l.contains("Broadcast"))
    assert(shuffles === 2,
      s"expected eval-distinct + hit-agg shuffles only, got $shuffles:\n$plan")
  }

  test("plan: eval side broadcast, corpus un-shuffled — the only shuffle " +
    "exchange is the final pair distinct") {
    val plan = Decontaminate.pairs(corpus, evalSet, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    val shuffles = plan.linesIterator
      .count(l => l.contains("Exchange") && !l.contains("Broadcast"))
    assert(shuffles === 1,
      s"expected exactly one (pair-distinct) shuffle, got $shuffles:\n$plan")
  }
}
