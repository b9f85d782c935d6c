package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-feed DERIVATION from two full snapshots — the inverse of
  * [[MergeStore]] (which consumes a feed): upstream corpora usually
  * arrive as periodic full dumps ("here is this month's crawl"), and the
  * incremental machinery downstream — merge stores, suppression ledgers,
  * index appends — wants added/removed/changed keys, not 100 TB of
  * mostly-identical rows.
  *
  * Scale shape: both snapshots are first projected to (key, fingerprint)
  * — an 16-byte row instead of the full document — so the one unavoidable
  * key-shuffle (a full outer join on the key) moves ~2% of the corpus
  * bytes. Change classification is a null-pattern `CASE` on the joined
  * frame; unchanged keys (fingerprints equal — the overwhelming majority
  * between adjacent dumps) are dropped right after the join, so
  * everything downstream is sized by the CHURN, not the corpus. The
  * fingerprint makes "changed" exact-by-content: callers pick the
  * expression (content hash, normalized-text hash, struct of fields) and
  * the same expression replays in the DuckDB oracle.
  *
  * Reference analog: the reference diffs retrieval state vs. a
  * checkpoint by anti-join (`background_retrieval.py:157-169`); this
  * generalizes to the three-way add/remove/change split over arbitrary
  * snapshots.
  */
object SnapshotDiff {

  /** (key, change, old_fp, new_fp) for every key whose presence or
    * fingerprint differs between the snapshots. `change` ∈
    * {'added', 'removed', 'changed'}. Inputs are (keyCol, fpCol) frames
    * (project before calling — that projection is the byte-shrink).
    * Fingerprints compare NULL-SAFELY (`<=>`, SQL `IS DISTINCT FROM`):
    * two null fingerprints are "unchanged", null-vs-value is "changed" —
    * the only comparison whose oracle mirror is exact under the null
    * gate.
    */
  def changes(
      oldSnap: DataFrame,
      newSnap: DataFrame,
      keyCol: String,
      fpCol: String): DataFrame = {
    // presence is tracked by explicit markers, NEVER by fingerprint
    // nullness: a key that exists with a null fingerprint must still
    // classify by presence (the null gate caught the conflation — rows
    // removed-with-null-fp silently vanished)
    val o = oldSnap.select(col(keyCol).as("_k"), col(fpCol).as("old_fp"),
      lit(true).as("_in_old"))
    val n = newSnap.select(col(keyCol).as("_k"), col(fpCol).as("new_fp"),
      lit(true).as("_in_new"))
    o.join(n, Seq("_k"), "full_outer")
      .withColumn("change",
        when(col("_in_old").isNull, lit("added"))
          .when(col("_in_new").isNull, lit("removed"))
          .when(!(col("old_fp") <=> col("new_fp")), lit("changed")))
      .filter(col("change").isNotNull)
      .select(col("_k").as(keyCol), col("change"),
        col("old_fp"), col("new_fp"))
  }

  /** The derived feed in [[MergeStore.merge]]'s contract (`keyCol`,
    * `is_delete`, `seq`, payload): added/changed keys carry the NEW
    * snapshot's payload rows (broadcast-or-shuffle semi-join sized by
    * churn), removed keys become tombstones with null payload. Applying
    * the feed to a store initialized from the OLD snapshot converges it
    * to the NEW one (SnapshotDiffSpec pins this end-to-end).
    */
  def asMergeFeed(
      diff: DataFrame,
      newSnap: DataFrame,
      keyCol: String,
      seq: Long): DataFrame = {
    val payloadCols = newSnap.columns.filterNot(_ == keyCol).toSeq
    val upserts = newSnap
      .join(diff.filter(col("change") =!= "removed").select(keyCol),
        Seq(keyCol), "left_semi")
      .withColumn("is_delete", lit(false))
    val removes = diff.filter(col("change") === "removed")
      .select((col(keyCol) +: payloadCols.map(c =>
        lit(null).cast(newSnap.schema(c).dataType).as(c))): _*)
      .withColumn("is_delete", lit(true))
    upserts.unionByName(removes).withColumn("seq", lit(seq))
  }
}
