package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the banded edit-distance contract introduced after the sf1 soak
  * caught the full-matrix DP grinding: the query reports exactly the
  * pairs within `maxDist` edits, with distances identical to the
  * unbanded metric on those pairs, and its plan is the broadcast +
  * respread shape whose parallelism is input-bound rather than
  * blocking-key-bound (a sort-merge join on ~75 (lang, len-bucket) keys
  * runs ~2 tasks regardless of cluster size).
  */
class EditDistanceSpec extends SparkSpec {

  test("banded result ≡ unbanded result filtered to the threshold") {
    val banded = StatsQueries.editDistance.spark(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    // The reference computation: same blocking, full (unbanded)
    // levenshtein, then the threshold applied as a plain filter.
    val docs = graft.queries.tbl(spark, sf(), "documents")
      .filter(octet_length(col("text")) === length(col("text")))
      .select(col("doc_id"), col("lang"), col("n_chars"), col("text"))
    val a = docs.select(col("doc_id").as("ai"), col("lang").as("al"),
      col("n_chars").as("an"), col("text").as("at"))
    val b = docs.select(col("doc_id").as("bi"), col("lang").as("bl"),
      col("n_chars").as("bn"), col("text").as("bt"))
    val full = a.join(b, col("al") === col("bl") && col("ai") < col("bi") &&
        abs(col("an") - col("bn")) <= 5)
      .select(col("ai"), col("bi"),
        levenshtein(col("at"), col("bt")).cast("long").as("d"))
      .filter(col("d") <= 24)
      .orderBy("ai", "bi")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    assert(banded.nonEmpty, "fixture produced no near-dup pairs")
    assert(banded.toSeq == full.toSeq)
    assert(banded.forall(_._3 <= 24))
  }

  test("plan: broadcast join with a respread probe, no sort-merge join") {
    val df = StatsQueries.editDistance.spark(spark, sf())
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"),
      "blocking-key SMJ would bound parallelism by key cardinality")
    // The probe side must carry an explicit round-robin respread so
    // task count tracks defaultParallelism, not the 2-file input layout.
    assert(p.contains("RoundRobinPartitioning"), p.take(2000))
  }
}
