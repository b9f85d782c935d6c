package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.SnapshotDiff

/** Oracle check for [[graft.ops.SnapshotDiff]]: two synthetic corpus
  * dumps carved from `documents` — the "old" dump misses every 5th id,
  * the "new" dump misses every 7th and rewrites every 11th's text — and
  * the derived add/remove/change feed is hash-matched against DuckDB's
  * declarative FULL OUTER JOIN with `IS DISTINCT FROM` (the exact SQL
  * mirror of the operator's null-safe `<=>` fingerprint compare).
  */
object SnapshotDiffQuery {

  import TextQueries.duckMd5num

  val diff = Q(
    "q_snapshot_diff",
    (s, dir) => {
      val docs = tbl(s, dir, "documents")
      val oldSnap = docs.filter(col("doc_id") % 5 =!= 0)
        .withColumn("fp", expr("md5num(text)"))
      val newSnap = docs.filter(col("doc_id") % 7 =!= 0)
        .withColumn("text",
          when(col("doc_id") % 11 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")))
        .withColumn("fp", expr("md5num(text)"))
      SnapshotDiff.changes(oldSnap, newSnap, "doc_id", "fp")
        .select(col("doc_id"), col("change"), col("old_fp"), col("new_fp"))
        .orderBy("doc_id")
    },
    Some(s"""WITH o AS (SELECT doc_id, ${duckMd5num("text")} AS fp
                        FROM documents WHERE doc_id % 5 != 0),
                  n AS (SELECT doc_id,
                               ${duckMd5num(
                                 "CASE WHEN doc_id % 11 = 0 THEN text || ' v2' ELSE text END")} AS fp
                        FROM documents WHERE doc_id % 7 != 0)
             SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
                    CASE WHEN o.doc_id IS NULL THEN 'added'
                         WHEN n.doc_id IS NULL THEN 'removed'
                         ELSE 'changed' END AS change,
                    o.fp AS old_fp, n.fp AS new_fp
             FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
             WHERE o.doc_id IS NULL OR n.doc_id IS NULL
                OR o.fp IS DISTINCT FROM n.fp
             ORDER BY doc_id"""),
    bench = true)

  val all: Seq[Q] = Seq(diff)
}
