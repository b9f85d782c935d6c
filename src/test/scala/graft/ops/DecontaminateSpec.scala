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
