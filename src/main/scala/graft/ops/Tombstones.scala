package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Fs

/** Takedown propagation for the DERIVED serving stores — the forget
  * ledger behind [[Bm25]] postings, [[VectorIndex]] / [[ProductQuantizer]]
  * bucket stores and [[SignatureStore]] signature tables (r11 verdict:
  * `ClusteredStore.deleteKeysDV` forgets a document in the PRIMARY
  * store, but the indexes built FROM the corpus kept serving its id and
  * its neighbors until a full rebuild — a compliance pipeline needs the
  * same forget at takedown cost, not rebuild cost).
  *
  * Design: one append-only ledger of banned ids under the store's
  * `_tombstones/` dir (underscore-prefixed, so the store's own parquet
  * reads never pick it up as data). A takedown is ONE staged write of
  * the new ids — O(takedown), no store file touched. Every read path
  * masks through a broadcast anti-join against the ledger (bounded:
  * compliance-takedown scale, like the primary store's DV key lists),
  * and every APPEND path drops banned ids at ingest — so a re-appended
  * banned document can never resurrect, which is the deliberate
  * semantic difference from the primary store's point-in-time deletion
  * vectors: an index tombstone is "forget this id" until the ledger is
  * explicitly cleared by a rebuild. Physical disposal rides the store's
  * own rewrite paths (compaction / bucket purge); the mask keeps
  * answers exact in the meantime.
  *
  * The ledger tolerates duplicate id rows (adds are idempotent-ish by
  * pre-filtering, and [[ids]] serves DISTINCT) — so concurrent
  * takedowns commute exactly like [[Bm25]]'s stats delta ledger.
  */
object Tombstones {

  private def dir(path: String) = s"$path/_tombstones"

  /** True when the store carries at least one tombstone file. */
  def exists(spark: SparkSession, path: String): Boolean =
    Fs.list(spark, dir(path)).nonEmpty

  /** The banned-id frame (`_ts_id` bigint, distinct); None when the
    * store has no ledger — so unmasked stores keep their exact plans
    * (no join is ever added for a store that never saw a takedown).
    */
  def ids(spark: SparkSession, path: String): Option[DataFrame] =
    if (!exists(spark, path)) None
    else Some(spark.read.parquet(dir(path)).select("_ts_id").distinct())

  /** Ban `newIds`: one staged parquet append of the ids (plus an
    * optional payload column the store needs at read time — [[Bm25]]
    * records each banned doc's length so corpus stats stay exact
    * without rescanning postings). Ids already banned are skipped, so
    * a replayed takedown cannot double-record a payload.
    */
  def add(spark: SparkSession, path: String, newIds: Seq[Long],
      payload: Map[Long, Long] = Map.empty,
      payloadCol: String = "_ts_n"): Unit = {
    val existing: Set[Long] = ids(spark, path)
      .map(_.collect().map(_.getLong(0)).toSet).getOrElse(Set.empty)
    val fresh = newIds.distinct.filterNot(existing)
    if (fresh.nonEmpty) {
      import spark.implicits._
      Fs.stagedAppend(
        fresh.map(i => (i, payload.getOrElse(i, 0L)))
          .toDF("_ts_id", payloadCol).coalesce(1),
        None, dir(path))
      ()
    }
  }

  /** The full ledger rows (id + payload columns) for stores that read
    * the payload back ([[Bm25.readStats]]); empty-typed when absent.
    */
  def ledger(spark: SparkSession, path: String): Option[DataFrame] =
    if (!exists(spark, path)) None
    else Some(spark.read.parquet(dir(path)))

  /** `df` with banned ids masked out: a broadcast anti-join on
    * `idCol` (cast to bigint — int-keyed stores mask the same ids).
    * Identity when the store has no ledger.
    */
  def mask(spark: SparkSession, path: String, df: DataFrame,
      idCol: String): DataFrame =
    ids(spark, path) match {
      case None => df
      case Some(t) =>
        df.join(broadcast(t), df(idCol).cast("long") === t("_ts_id"),
          "left_anti")
    }

  /** Drop the ledger — the rebuild path's reset (a store rebuilt from a
    * corpus that already honored the takedown has nothing to mask).
    */
  def clear(spark: SparkSession, path: String): Unit =
    Fs.delete(spark, dir(path))

  /** Physically dispose of tombstoned rows in a `partCol=`-partitioned
    * store — a PARTITION-PRUNED rewrite, never a rebuild: one
    * column-pruned scan finds the partitions still holding banned rows,
    * and only those are rewritten (masked survivors staged in, old
    * files deleted). `uniqueKey` is the store's row identity (IVF/PQ:
    * vec_id; BM25 postings: doc×term) — deduping on it makes a CRASHED
    * purge converge on re-run: a crash between landing the survivors
    * and deleting the old files leaves both on disk, and the re-run
    * folds the duplicates back to one row instead of compounding them.
    * The ledger stays in force afterwards (appends must keep dropping
    * banned ids); reads are already exact either way — this reclaims
    * bytes, not correctness. Single-maintainer contract, like every
    * compaction in this repo. Returns partitions rewritten.
    */
  def purgePartitions(spark: SparkSession, ledgerPath: String,
      dataDir: String, partCol: String, idCol: String,
      uniqueKey: Seq[String]): Int =
    ids(spark, ledgerPath) match {
      case None => 0
      case Some(t) =>
        val all = spark.read.parquet(dataDir)
        val hitParts = all
          .join(broadcast(t), all(idCol).cast("long") === t("_ts_id"),
            "left_semi")
          .select(partCol).distinct().collect()
          .filterNot(_.isNullAt(0)).map(_.get(0).toString).toSeq
        hitParts.foreach { p =>
          val pDir = s"$dataDir/$partCol=$p"
          val old = Fs.list(spark, pDir)
            .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
            .map(_.getPath.toString)
          val rows = spark.read.parquet(pDir)
            .dropDuplicates(uniqueKey)
          mask(spark, ledgerPath, rows, idCol)
            .write.mode("overwrite").parquet(s"$pDir.purge")
          // explicit schema: a fully-banned partition has ZERO
          // survivors, and its empty .purge dir would fail inference
          Fs.stagedAppend(
            spark.read.schema(rows.schema).parquet(s"$pDir.purge"),
            None, pDir)
          old.foreach(f => Fs.delete(spark, f))
          Fs.delete(spark, s"$pDir.purge")
        }
        hitParts.size
    }
}
