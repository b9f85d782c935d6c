package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact long-span self-deduplication — the corpus-against-itself sibling
  * of [[Decontaminate.exactGramHits]]: a document that shares at least one
  * exact L-word span with an EARLIER document (lower id) is dropped,
  * keeping the first occurrence. This is the gram-granular form of
  * suffix-array substring dedup (drop documents repeating a long verbatim
  * span already seen), which document-level MinHash never fires on when
  * the repeated span is embedded in otherwise-different text.
  *
  * Scale shape: spans travel as 60-bit digests (native one-pass
  * [[graft.functions.ShingleHashes]] kernel), so both exchanges carry
  * longs — (1) gram → min(id) with map-side combine (reduce side holds
  * distinct grams), (2) the 1:1 enrich join back on gram (non-expanding,
  * AQE-skew-safe: a mass-duplicated span makes a hot gram key, but each
  * joined row still produces exactly one output row), then the
  * per-document min. Documents shorter than L words produce no grams and
  * are kept by the left join.
  */
object SelfDedup {

  /** (idCol, kept, dup_of) for every input document: `kept` is false iff
    * some gram of the document first occurs in an earlier document;
    * `dup_of` is the smallest such earlier id (null when kept).
    */
  def markSpans(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(docs.sparkSession)
    val g = docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("_id"),
        explode(expr(s"shingle_hashes(split($textCol, ' '), $n)")).as("gram"))
    val firsts = g.groupBy("gram").agg(min("_id").as("m"))
    val verdict = g.join(firsts, Seq("gram"))
      .groupBy("_id")
      .agg(min(when(col("m") < col("_id"), col("m"))).as("dup_of"))
    docs.select(col(idCol))
      .join(verdict.withColumnRenamed("_id", idCol), Seq(idCol), "left")
      .select(col(idCol), col("dup_of").isNull.as("kept"), col("dup_of"))
  }
}
