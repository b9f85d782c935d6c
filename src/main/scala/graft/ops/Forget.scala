package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Fs

/** The unified takedown orchestrator (r12 verdict missing #1):
  * forgetting a document set used to take N separate calls —
  * [[ClusteredStore.deleteKeysDV]] on the primary store, then each
  * derived store's takedown entry point — with nothing recording which
  * stores had acknowledged. A crash mid-propagation left the corpus
  * forgetting the ids while an index still served them, and no artifact
  * said which half ran.
  *
  * One [[forget]] call now propagates a request to every registered
  * [[Target]] and records, in a per-store ACK LEDGER, exactly which
  * stores completed — the reference's retrieval-checkpoint shape
  * (`background_retrieval.py:316-326`: a keyed table whose presence
  * rows make replay skip finished work) applied to takedowns. The
  * ledger is an append-only parquet dir of
  * (`_fg_req`, `_fg_store`, `_fg_ids`) rows: one REQUEST row
  * (`_fg_store = "_request"`) pinning the id set, then one ack row per
  * completed store, appended AFTER that store's takedown returns — so a
  * crash at any point leaves a ledger that names every unfinished
  * store, [[status]] renders it, and [[replay]] re-runs exactly the
  * missing (request × store) pairs to convergence. Every registered
  * takedown is idempotent (ledger adds anti-join-dedupe; DV deletes of
  * already-masked keys are no-ops), so the crash window between a
  * store's takedown and its ack re-runs harmlessly.
  *
  * Scale shape: the ledger is driver-bounded by construction — rows
  * grow with (compliance requests × registered stores), not with data —
  * and replay touches each store once per unfinished request. The ids
  * themselves ride each store's own scale contract
  * ([[Tombstones.add]]'s distributed dedup, [[ClusteredStore]]'s
  * key-frame joins past `LiteralKeyMax`).
  */
object Forget {

  /** One registered store: a stable name (the ack key — keep it
    * constant across replays) plus the store's idempotent takedown
    * entry point.
    */
  final case class Target(name: String, takedown: Seq[Long] => Unit)

  /** `_fg_store` value of the row that pins a request's id set. */
  val RequestStore = "_request"

  // ----- convenience constructors for the engine's own stores --------

  def clusteredTarget(spark: SparkSession, dir: String,
      keyCol: String): Target =
    Target(s"primary:$dir",
      ids => { ClusteredStore.deleteKeysDV(spark, dir, keyCol, ids); () })

  def bm25Target(spark: SparkSession, path: String,
      idCol: String): Target =
    Target(s"bm25:$path", ids => Bm25.takedownIndex(spark, path, idCol, ids))

  def ivfTarget(spark: SparkSession, path: String): Target =
    Target(s"ivf:$path", ids => VectorIndex.takedownIvf(spark, path, ids))

  def pqTarget(spark: SparkSession, path: String): Target =
    Target(s"pq:$path", ids => ProductQuantizer.takedownStore(spark, path, ids))

  def signatureTarget(spark: SparkSession, path: String): Target =
    Target(s"sigs:$path", ids => SignatureStore.takedown(spark, path, ids))

  def bandedSignatureTarget(spark: SparkSession, table: String): Target =
    Target(s"sigs-banded:$table",
      ids => SignatureStore.takedownBanded(spark, table, ids))

  // -------------------------------------------------------------------

  private def rows(spark: SparkSession, ledgerDir: String): Option[DataFrame] =
    if (!Fs.nonEmptyDir(spark, ledgerDir)) None
    else Some(spark.read.parquet(ledgerDir))

  private def appendRow(spark: SparkSession, ledgerDir: String,
      reqId: String, store: String, ids: Seq[Long]): Unit = {
    import spark.implicits._
    Fs.stagedAppend(
      Seq((reqId, store, ids)).toDF("_fg_req", "_fg_store", "_fg_ids")
        .coalesce(1),
      None, ledgerDir)
    ()
  }

  /** The id set a request pinned; empty when the request is unknown. */
  private def storedIds(spark: SparkSession, ledgerDir: String,
      reqId: String): Seq[Long] =
    rows(spark, ledgerDir) match {
      case None => Seq.empty
      case Some(df) =>
        df.filter(col("_fg_store") === RequestStore &&
            col("_fg_req") === reqId)
          .select(explode(col("_fg_ids")).as("id"))
          .distinct().collect().map(_.getLong(0)).toSeq
    }

  private def ackedStores(spark: SparkSession, ledgerDir: String,
      reqId: String): Set[String] =
    rows(spark, ledgerDir) match {
      case None => Set.empty
      case Some(df) =>
        df.filter(col("_fg_req") === reqId &&
            col("_fg_store") =!= RequestStore)
          .select("_fg_store").distinct()
          .collect().map(_.getString(0)).toSet
    }

  /** Forget `ids` across every target, recording a per-store ack after
    * each completes. Re-invoking with the same `reqId` (a crash replay)
    * skips acked stores and runs only the unfinished ones — the id set
    * is read back from the ledger's request row, so replay converges on
    * the ORIGINAL set even if the caller lost it; passing a DIFFERENT
    * non-empty set under an existing reqId is refused (a new takedown
    * is a new request). Throws through a failing target — the ledger
    * then shows exactly which stores completed. No-op on empty ids.
    */
  def forget(spark: SparkSession, ledgerDir: String, reqId: String,
      ids: Seq[Long], targets: Seq[Target]): Unit = {
    require(targets.map(_.name).distinct.size == targets.size,
      "duplicate target names — acks would alias")
    val stored = storedIds(spark, ledgerDir, reqId)
    val effective =
      if (stored.isEmpty) ids.distinct
      else {
        require(ids.isEmpty || ids.distinct.toSet == stored.toSet,
          s"request '$reqId' already pins ${stored.size} ids; a " +
            "different id set is a new request — use a new reqId")
        stored
      }
    if (effective.isEmpty) return
    if (stored.isEmpty)
      appendRow(spark, ledgerDir, reqId, RequestStore, effective)
    val acked = ackedStores(spark, ledgerDir, reqId)
    targets.filterNot(t => acked(t.name)).foreach { t =>
      t.takedown(effective)
      appendRow(spark, ledgerDir, reqId, t.name, Seq.empty)
    }
  }

  /** Re-run every (request × store) pair the ledger shows unfinished —
    * the crash-recovery entry point, safe to run at any time (complete
    * requests are skipped wholesale, acked stores per request too).
    * Returns the number of requests that needed work.
    */
  def replay(spark: SparkSession, ledgerDir: String,
      targets: Seq[Target]): Int =
    rows(spark, ledgerDir) match {
      case None => 0
      case Some(df) =>
        val acks = df.filter(col("_fg_store") =!= RequestStore)
          .select("_fg_req", "_fg_store").distinct()
          .collect().map(r => (r.getString(0), r.getString(1))).toSet
        val reqs = df.filter(col("_fg_store") === RequestStore)
          .select("_fg_req").distinct()
          .collect().map(_.getString(0)).sorted.toSeq
        val pendingReqs = reqs.filter(r =>
          targets.exists(t => !acks((r, t.name))))
        pendingReqs.foreach { r =>
          forget(spark, ledgerDir, r, Seq.empty, targets)
        }
        pendingReqs.size
    }

  /** Fold the ack ledger's accumulated small files (one per request
    * row / ack row) into bounded generations via
    * [[LogCompactor.compactFlat]] — rows preserved EXACTLY (request
    * and ack rows are all load-bearing; dedup happens at read time),
    * so a decade of takedown requests stays a handful of files.
    */
  def compactLedger(spark: SparkSession, ledgerDir: String,
      targetFileBytes: Long = 128L * 1024 * 1024)
      : Option[LogCompactor.CompactionReport] =
    LogCompactor.compactFlat(spark, ledgerDir, targetFileBytes)

  /** The ack matrix as a frame: one row per (request, registered
    * store), `acked` false where a crash (or an in-flight run) left the
    * store unpropagated — the artifact that says which half ran.
    */
  def status(spark: SparkSession, ledgerDir: String,
      storeNames: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("_fg_req", StringType), StructField("_fg_store", StringType),
      StructField("acked", BooleanType)))
    rows(spark, ledgerDir) match {
      case None =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      case Some(df) =>
        import spark.implicits._
        val reqs = df.filter(col("_fg_store") === RequestStore)
          .select("_fg_req").distinct()
        val acks = df.filter(col("_fg_store") =!= RequestStore)
          .select("_fg_req", "_fg_store").distinct()
          .withColumn("acked", lit(true))
        reqs.crossJoin(storeNames.toDF("_fg_store"))
          .join(acks, Seq("_fg_req", "_fg_store"), "left")
          .na.fill(false, Seq("acked"))
          .orderBy("_fg_req", "_fg_store")
    }
  }
}
