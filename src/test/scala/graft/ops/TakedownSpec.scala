package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Fs

/** Takedown propagation into the DERIVED serving stores (r11 verdict:
  * `ClusteredStore.deleteKeysDV` forgets a document in the primary
  * store, but the BM25 postings, ANN bucket stores and dedup signature
  * tables kept surfacing its id until a full rebuild). Contract under
  * test for every store: one forget-ledger write at takedown cost (zero
  * store files touched), reads behave exactly like a complement-corpus
  * rebuild, and APPEND-AFTER-TAKEDOWN NEVER RESURRECTS the id — the
  * deliberate inverse of the primary store's point-in-time deletion
  * vectors. The cross-engine halves (probe ≡ DuckDB over the
  * complement) are pinned by `q_ann_after_takedown` /
  * `q_bm25_after_takedown`; this spec covers the store mechanics those
  * oracle rows cannot see.
  */
class TakedownSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(ids: Range) =
    ids.toDF("id").select(col("id").cast("long").as("vec_id"))
      .withColumn("v", expr(
        "transform(sequence(0, 15), j -> cos(vec_id * 13 + j))"))
      .withColumn("nrm", expr("dot_product(v, v)"))

  private def docs(ids: Range) =
    ids.toDF("id").select(col("id").cast("long").as("doc_id"))
      .withColumn("text", concat_ws(" ",
        lit("alpha"), lit("beta"),
        concat(lit("w"), col("doc_id") % 7),
        concat(lit("w"), col("doc_id") % 11),
        concat(lit("x"), col("doc_id"))))

  test("IVF store: takedown masks the id out of every probe (answers " +
    "== a complement rebuild), a re-append is dropped at ingest, and " +
    "purge physically rewrites ONLY the hit buckets with the ledger " +
    "still in force") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val e = vecs(0 until 400)
    val cents = VectorIndex.centroidsFrom(e, 8)
    val path = java.nio.file.Files.createTempDirectory("td_ivf").toString
    VectorIndex.buildIvf(e, cents, path)
    val q = e.filter(col("vec_id") >= 396)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"))
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    val before = VectorIndex.probe(spark, path, q, cents, 3, 10)
    // ban the top neighbors of the first query — the takedown must
    // visibly reshape results, not just filter a stranger
    val banned = before.filter(col("query_id") === 396L)
      .select("neighbor_id").collect().map(_.getLong(0)).take(4).toSeq
    VectorIndex.takedownIvf(spark, path, banned)

    val after = VectorIndex.probe(spark, path, q, cents, 3, 10)
    assert(after.filter(col("neighbor_id").isin(banned: _*))
      .count() === 0L)
    // == probing a store REBUILT from the complement corpus
    val rebuilt = java.nio.file.Files.createTempDirectory("td_ivf2")
      .toString
    VectorIndex.buildIvf(
      e.filter(!col("vec_id").isin(banned: _*)), cents, rebuilt)
    assert(key(after) ===
      key(VectorIndex.probe(spark, rebuilt, q, cents, 3, 10)))

    // resurrection attempt: re-append exactly the banned vectors
    VectorIndex.appendToIvf(e.filter(col("vec_id").isin(banned: _*)),
      cents, path)
    assert(key(VectorIndex.probe(spark, path, q, cents, 3, 10)) ===
      key(after), "append-after-takedown must not change any answer")

    // physical disposal: only the hit buckets rewrite; a RAW read of
    // the data files no longer contains the ids; answers unchanged;
    // the ledger still blocks later appends
    val purged = VectorIndex.purgeIvf(spark, path)
    assert(purged > 0)
    assert(spark.read.parquet(path)
      .filter(col("vec_id").isin(banned: _*)).count() === 0L,
      "purge must remove the banned rows physically")
    assert(key(VectorIndex.probe(spark, path, q, cents, 3, 10)) ===
      key(after))
    VectorIndex.appendToIvf(e.filter(col("vec_id").isin(banned: _*)),
      cents, path)
    assert(spark.read.parquet(path)
      .filter(col("vec_id").isin(banned: _*)).count() === 0L,
      "the ledger survives the purge — appends keep dropping banned ids")
  }

  test("IVF-PQ store: takedown masks, re-append drops at ingest") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val e = vecs(0 until 200)
    val cents = VectorIndex.centroidsFrom(e, 4)
    val books = ProductQuantizer.train(e, "v", d = 16, m = 4, k = 4,
      iters = 2)
    val path = java.nio.file.Files.createTempDirectory("td_pq").toString
    ProductQuantizer.buildStore(e, "v", books, cents, path)
    val q = e.filter(col("vec_id") < 2)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"))
    val before = ProductQuantizer.probeStore(spark, path, q, books,
      cents, nProbe = 2, topK = 8)
    val banned = before.select("neighbor_id").collect()
      .map(_.getLong(0)).distinct.take(3).toSeq
    ProductQuantizer.takedownStore(spark, path, banned)
    val after = ProductQuantizer.probeStore(spark, path, q, books,
      cents, nProbe = 2, topK = 8)
    assert(after.filter(col("neighbor_id").isin(banned: _*))
      .count() === 0L)
    ProductQuantizer.appendToStore(
      e.filter(col("vec_id").isin(banned: _*)), "v", books, cents, path)
    assert(ProductQuantizer.probeStore(spark, path, q, books, cents,
        nProbe = 2, topK = 8)
      .filter(col("neighbor_id").isin(banned: _*)).count() === 0L,
      "append-after-takedown must not resurrect into PQ candidates")
  }

  test("BM25 index: corpus stats after a takedown equal a complement " +
    "recompute exactly; a replayed takedown is idempotent (no double " +
    "subtraction); re-appended banned docs skew nothing") {
    val d = docs(0 until 300)
    val path = java.nio.file.Files.createTempDirectory("td_bm25").toString
    Bm25.buildIndex(d, "doc_id", "text", path)
    val banned = Seq(10L, 77L, 123L, 250L)
    Bm25.takedownIndex(spark, path, "doc_id", banned)

    def statsKey(df: org.apache.spark.sql.DataFrame) = {
      val r = df.select("n", "sdl", "avgdl").head()
      (r.getLong(0), r.getLong(1), r.getDouble(2))
    }
    val complement = Bm25.corpusStats(
      d.filter(!col("doc_id").isin(banned: _*)), "text")
    assert(statsKey(Bm25.readStats(spark, path)) === statsKey(complement))

    // replayed takedown: already-banned ids are skipped, stats stable
    Bm25.takedownIndex(spark, path, "doc_id", banned)
    assert(statsKey(Bm25.readStats(spark, path)) === statsKey(complement))

    // resurrection attempt: postings AND stats must both ignore it
    Bm25.appendToIndex(d.filter(col("doc_id").isin(banned: _*)),
      "doc_id", "text", path)
    assert(statsKey(Bm25.readStats(spark, path)) === statsKey(complement))
    val hits = Bm25.probeIndex(spark, path, "doc_id",
      Seq("alpha", "w3"), topK = 300)
    assert(hits.filter(col("doc_id").isin(banned: _*)).count() === 0L)
    // a takedown of a doc that never existed is banned for the future
    // but subtracts nothing
    Bm25.takedownIndex(spark, path, "doc_id", Seq(999999L))
    assert(statsKey(Bm25.readStats(spark, path)) === statsKey(complement))
  }

  test("physical disposal: purgeIndex rewrites only the term buckets " +
    "holding banned postings (raw files clean, probe and stats " +
    "unchanged); purgeStore does the same for IVF-PQ codes") {
    val d = docs(0 until 200)
    val path = java.nio.file.Files.createTempDirectory("td_purge").toString
    Bm25.buildIndex(d, "doc_id", "text", path)
    val banned = Seq(11L, 42L)
    Bm25.takedownIndex(spark, path, "doc_id", banned)
    val before = Bm25.probeIndex(spark, path, "doc_id",
      Seq("alpha", "w3"), topK = 200).collect().toSeq
    val statsBefore = Bm25.readStats(spark, path)
      .select("n", "sdl").head()

    val purged = Bm25.purgeIndex(spark, path, "doc_id")
    assert(purged > 0)
    assert(spark.read.parquet(s"$path/postings")
      .filter(col("doc_id").isin(banned: _*)).count() === 0L,
      "purge must remove the banned postings physically")
    assert(Bm25.probeIndex(spark, path, "doc_id",
      Seq("alpha", "w3"), topK = 200).collect().toSeq === before)
    assert(Bm25.readStats(spark, path).select("n", "sdl").head() ===
      statsBefore,
      "the takedown's stats correction stays valid after the purge")
    // the ledger survives: a re-append is still dropped
    Bm25.appendToIndex(d.filter(col("doc_id").isin(banned: _*)),
      "doc_id", "text", path)
    assert(spark.read.parquet(s"$path/postings")
      .filter(col("doc_id").isin(banned: _*)).count() === 0L)

    graft.functions.GraftFunctions.ensureRegistered(spark)
    val e = vecs(0 until 150)
    val cents = VectorIndex.centroidsFrom(e, 4)
    val books = ProductQuantizer.train(e, "v", d = 16, m = 4, k = 4,
      iters = 1)
    val pq = java.nio.file.Files.createTempDirectory("td_purge_pq")
      .toString
    ProductQuantizer.buildStore(e, "v", books, cents, pq)
    ProductQuantizer.takedownStore(spark, pq, Seq(99L, 100L))
    assert(ProductQuantizer.purgeStore(spark, pq) > 0)
    assert(spark.read.parquet(pq)
      .filter(col("vec_id").isin(99L, 100L)).count() === 0L)

    // a FULLY-banned bucket purges to zero survivors without choking
    // on its own empty rewrite
    val ivf = java.nio.file.Files.createTempDirectory("td_purge_all")
      .toString
    VectorIndex.buildIvf(e, cents, ivf)
    val wholeBucket = spark.read.parquet(ivf)
      .filter(col("bucket") === 1).select("vec_id").collect()
      .map(_.getLong(0)).toSeq
    assert(wholeBucket.nonEmpty)
    VectorIndex.takedownIvf(spark, ivf, wholeBucket)
    assert(VectorIndex.purgeIvf(spark, ivf) > 0)
    val left = spark.read.parquet(ivf)
    assert(left.filter(col("bucket") === 1).count() === 0L)
    assert(left.count() === 150L - wholeBucket.size)
  }

  test("signature stores: a taken-down doc pairs with nothing — flat " +
    "store via load/appendSignatures, banded bucketed store via " +
    "takedownBanded — and no rebuild ever ran") {
    val base = docs(0 until 60)
      // force near-dup pairs: consecutive ids share most shingles
      .withColumn("text", concat_ws(" ", lit("the quick brown fox"),
        lit("jumps over the lazy dog"),
        concat(lit("tail"), col("doc_id") / 2)))
    val path = java.nio.file.Files.createTempDirectory("td_sig").toString
    SignatureStore.build(base, path)
    val pairsBefore = SignatureStore.incrementalNearDups(
      SignatureStore.load(spark, path), base.filter(col("doc_id") < 10))
    assert(pairsBefore.count() > 0)
    val banned = Seq(4L, 5L)
    SignatureStore.takedown(spark, path, banned)
    assert(SignatureStore.load(spark, path)
      .filter(col("doc_id").isin(banned: _*)).count() === 0L)
    // re-append: dropped at ingest
    SignatureStore.appendSignatures(
      base.filter(col("doc_id").isin(banned: _*)), path)
    assert(SignatureStore.load(spark, path)
      .filter(col("doc_id").isin(banned: _*)).count() === 0L)
    val pairsAfter = SignatureStore.incrementalNearDups(
      SignatureStore.load(spark, path),
      base.filter(col("doc_id") < 10 && !col("doc_id").isin(banned: _*)))
    assert(pairsAfter.filter(col("ai").isin(banned: _*) ||
      col("bi").isin(banned: _*)).count() === 0L)

    // banded bucketed store: the mask covers BOTH pair sides
    SignatureStore.buildBanded(base, "td_banded_sigs", numBuckets = 2)
    val bandedBefore = SignatureStore.bucketedNearDups(
      spark, "td_banded_sigs", base)
    assert(bandedBefore.filter(col("ai") === 4L || col("bi") === 4L)
      .count() > 0, "precondition: doc 4 pairs before the takedown")
    SignatureStore.takedownBanded(spark, "td_banded_sigs", Seq(4L))
    val banded = SignatureStore.bucketedNearDups(
      spark, "td_banded_sigs", base)
    assert(banded.filter(col("ai") === 4L || col("bi") === 4L)
      .count() === 0L)
    assert(banded.count() > 0, "other pairs keep serving")
  }
}
