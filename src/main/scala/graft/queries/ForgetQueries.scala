package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.{Bm25, ClusteredStore, Forget, SignatureStore, Tombstones}

/** Oracle check for the unified takedown orchestrator
  * ([[graft.ops.Forget]]): a forget request propagated across the
  * PRIMARY store and two derived serving stores, CRASHED between them,
  * then replayed to convergence — every store must afterwards agree
  * with DuckDB over the complement corpus, and the captured mid-crash
  * state must show the unpropagated store still serving the banned ids
  * (proving the crash was real, the ack ledger caught it, and replay —
  * not a rebuild — fixed it).
  */
object ForgetQueries {

  private val fixtures =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def memo(key: String, sfDir: String)(build: String => Unit): String =
    fixtures.compute(s"$key|$sfDir", (_, prev) => {
      if (prev != null) prev
      else {
        val base = java.nio.file.Files
          .createTempDirectory(s"graft_$key").toString
        build(base)
        base
      }
    })

  private def bannedPred(c: org.apache.spark.sql.Column) =
    pmod(c, lit(89L)) === 5

  /** (store, n_alive, n_banned) over a frame carrying doc_id. */
  private def leg(name: String,
      df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df.agg(
        count(lit(1)).cast("long").as("n_alive"),
        coalesce(sum(when(bannedPred(col("doc_id")), 1L).otherwise(0L)),
          lit(0L)).cast("long").as("n_banned"))
      .select(lit(name).as("store"), col("n_alive"), col("n_banned"))

  val forgetReplay = Q(
    "q_forget_replay",
    (s, dir) => {
      val base = memo("forget", dir) { b =>
        val docs = tbl(s, dir, "documents")
        ClusteredStore.init(docs, Seq("doc_id", "n_chars"), 8,
          s"$b/primary", bloomCols = Seq("doc_id"))
        Bm25.buildIndex(docs, "doc_id", "text", s"$b/bm25")
        SignatureStore.build(docs, s"$b/sigs")
        val banned = docs.filter(bannedPred(col("doc_id")))
          .select(col("doc_id").cast("long")).collect()
          .map(_.getLong(0)).toSeq
        val ledger = s"$b/forget_ledger"
        val primaryT = Forget.clusteredTarget(s, s"$b/primary", "doc_id")
        val bm25T = Forget.bm25Target(s, s"$b/bm25", "doc_id")
        val sigsT = Forget.signatureTarget(s, s"$b/sigs")
        // the crash: the signature store's takedown dies BEFORE doing
        // any work — primary and BM25 have acked, sigs has not. The
        // crashing stand-in records the REAL store's registry
        // coordinates (the process-loss story: closures die, the
        // ledger's kind/path rows survive).
        val crash = new Forget.Target(sigsT.name, sigsT.kind,
          sigsT.path, sigsT.arg,
          _ => throw new RuntimeException("injected crash"))
        try Forget.forget(s, ledger, "takedown-89-5", banned,
          Seq(primaryT, bm25T, crash))
        catch {
          case e: RuntimeException if e.getMessage == "injected crash" =>
        }
        // pin the mid-crash evidence: the unpropagated store still
        // serves every banned id (deterministic counts, recomputable by
        // the oracle), while the ledger names exactly one store unacked.
        // If the protocol ever broke (crash not visible in the ledger),
        // poison the count so the oracle hash FAILS rather than
        // silently passing.
        import s.implicits._
        val sigsLive = SignatureStore.load(s, s"$b/sigs")
        val pending = Forget.status(s, ledger,
            Seq(primaryT.name, bm25T.name, sigsT.name))
          .filter(!col("acked")).count()
        val crashVisible = banned.isEmpty || pending == 1L
        val beforeBanned =
          if (crashVisible) sigsLive.filter(bannedPred(col("doc_id"))).count()
          else -1000000L
        Seq(("sigs_before_replay", sigsLive.count(), beforeBanned))
          .toDF("store", "n_alive", "n_banned")
          .write.mode("overwrite").parquet(s"$b/before")
        // replay with the REAL targets converges every store
        Forget.replay(s, ledger, Seq(primaryT, bm25T, sigsT))
        // physical disposal on the flat store through the
        // marker-committed purge (r13) — answer-invariant
        SignatureStore.purge(s, s"$b/sigs")
        ()
      }
      val primary = leg("primary", ClusteredStore.read(s, s"$base/primary"))
      val hasPostings = graft.core.Fs.list(s, s"$base/bm25/postings")
        .exists(f => f.isDirectory && f.getPath.getName.startsWith("tb="))
      val bm25Docs =
        if (!hasPostings) s.range(0).select(col("id").as("doc_id"))
        else Tombstones.mask(s, s"$base/bm25",
          Tombstones.readStore(s, s"$base/bm25/postings"), "doc_id")
          .select("doc_id").distinct()
      val sigs = leg("sigs", SignatureStore.load(s, s"$base/sigs"))
      primary
        .unionByName(leg("bm25_postings", bm25Docs))
        .unionByName(sigs)
        .unionByName(s.read.parquet(s"$base/before"))
        .orderBy("store")
    },
    Some("""WITH d AS (
              SELECT doc_id, string_split(text, ' ') AS w
              FROM documents WHERE text IS NOT NULL)
            SELECT * FROM (
              SELECT 'primary' AS store,
                     CAST(COUNT(*) AS BIGINT) AS n_alive,
                     CAST(0 AS BIGINT) AS n_banned
              FROM documents WHERE doc_id % 89 <> 5
              UNION ALL
              SELECT 'bm25_postings', CAST(COUNT(*) AS BIGINT),
                     CAST(0 AS BIGINT)
              FROM d WHERE doc_id % 89 <> 5
              UNION ALL
              SELECT 'sigs', CAST(COUNT(*) AS BIGINT), CAST(0 AS BIGINT)
              FROM d WHERE len(w) >= 3 AND doc_id % 89 <> 5
              UNION ALL
              SELECT 'sigs_before_replay', CAST(COUNT(*) AS BIGINT),
                     CAST(SUM(CASE WHEN doc_id % 89 = 5 THEN 1 ELSE 0 END)
                       AS BIGINT)
              FROM d WHERE len(w) >= 3)
            ORDER BY store"""))

  val all: Seq[Q] = Seq(forgetReplay)
}
