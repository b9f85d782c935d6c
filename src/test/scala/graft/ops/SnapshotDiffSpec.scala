package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SnapshotDiff contract: the three-way classification is exact and
  * null-safe, unchanged keys never leave the operator, and the derived
  * merge feed CONVERGES a store initialized from the old snapshot to the
  * new snapshot — the end-to-end property that makes dump-diffing a safe
  * substitute for a real change feed.
  */
class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  private def fp(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("fp", expr("md5num(coalesce(text, ''))"))

  test("classification: added / removed / changed / unchanged-dropped, " +
    "null-safe") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val oldSnap = Seq(
      (1L, Some("same")), (2L, Some("before")), (3L, Some("bye")),
      (5L, Option.empty[String]))
      .toDF("id", "text")
      .withColumn("fp", expr("md5num(text)"))
    val newSnap = Seq(
      (1L, Some("same")), (2L, Some("after")), (4L, Some("new")),
      (5L, Option.empty[String]))
      .toDF("id", "text")
      .withColumn("fp", expr("md5num(text)"))
    val got = SnapshotDiff.changes(oldSnap, newSnap, "id", "fp")
      .select("id", "change").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(2L -> "changed", 3L -> "removed", 4L -> "added"))
    // id 1 (identical) and id 5 (null fp both sides) never emitted
  }

  test("derived merge feed converges old-initialized store to the new " +
    "snapshot") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val docs = graft.queries.tbl(spark, sf(), "documents")
      .select("doc_id", "text", "lang")
    val oldSnap = fp(docs.filter(col("doc_id") % 5 =!= 0))
    val newSnap = fp(docs.filter(col("doc_id") % 7 =!= 0)
      .withColumn("text",
        when(col("doc_id") % 11 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text"))))

    val store = java.nio.file.Files
      .createTempDirectory("snapdiff_store").toString + "/docs"
    MergeStore.init(oldSnap.drop("fp").withColumn("seq", lit(0L)),
      "doc_id", store, nBuckets = 8)

    val diff = SnapshotDiff.changes(oldSnap, newSnap, "doc_id", "fp")
    val feed = SnapshotDiff.asMergeFeed(diff, newSnap.drop("fp"),
      "doc_id", seq = 1L)
    MergeStore.merge(spark, store, feed, "doc_id", nBuckets = 8)

    val stored = MergeStore.read(spark, store)
      .select("doc_id", "text", "lang")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSet
    val want = newSnap.select("doc_id", "text", "lang")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSet
    assert(stored === want)
    // and the feed is churn-sized, not corpus-sized
    assert(feed.count() < docs.count())
  }
}
