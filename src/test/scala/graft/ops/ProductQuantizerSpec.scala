package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** ProductQuantizer contract: L2 sub-assignment with deterministic
  * tie-breaks, exact-fixed-point codebook refinement, reconstruction
  * identity when the corpus IS the codebook, compression shape, and
  * null/empty cleanliness.
  */
class ProductQuantizerSpec extends SparkSpec {

  private def frame(rows: Seq[(Long, Seq[Double])]) = {
    import spark.implicits._
    rows.toDF("vec_id", "v")
  }

  test("codes pick the L2-nearest entry; reconstruction concatenates winners") {
    // d=4, m=2, ds=2; 2 seed rows (vec_id 0, 1) that are L2-separated,
    // and probes that sit near one seed per subspace
    val e = frame(Seq(
      0L -> Seq(0.0, 0.0, 10.0, 10.0),
      1L -> Seq(5.0, 5.0, 0.0, 0.0),
      2L -> Seq(0.2, -0.1, 0.2, 0.1), // sub0 → code 0, sub1 → code 1
      3L -> Seq(4.9, 5.2, 9.0, 9.9))) // sub0 → code 1, sub1 → code 0
    val books = ProductQuantizer.train(e, "v", d = 4, m = 2, k = 2,
      iters = 0) // iters=0: codebook = the raw seeds, easy to reason about
    assert(books.map(_.sub) === Seq(0, 1))
    val enc = ProductQuantizer.encodeDecode(e, "v", books)
      .select(col("vec_id"), col("codes"), col("dv"), col("dn"))
      .collect().map(r => r.getLong(0) ->
        ((r.getSeq[Int](1), r.getSeq[Double](2), r.getDouble(3)))).toMap
    assert(enc(2L)._1 === Seq(0, 1))
    assert(enc(3L)._1 === Seq(1, 0))
    // reconstruction = concatenation of the winning sub-centroids
    assert(enc(2L)._2 === Seq(0.0, 0.0, 0.0, 0.0))
    assert(enc(3L)._2 === Seq(5.0, 5.0, 10.0, 10.0))
    // a seed row reconstructs to itself exactly
    assert(enc(0L)._2 === Seq(0.0, 0.0, 10.0, 10.0))
    assert(enc(1L)._2 === Seq(5.0, 5.0, 0.0, 0.0))
    // dn is the left-fold squared norm of the reconstruction
    assert(enc(3L)._3 === (((0.0 + 5.0 * 5.0) + 5.0 * 5.0) + 10.0 * 10.0)
      + 10.0 * 10.0)
  }

  test("refinement moves a code to the exact fixed-point member mean") {
    // one subspace (m=1), k=1: every row joins code 0, whose refined
    // vector must be the exact fixed-point mean of all members
    val e = frame(Seq(0L -> Seq(1.0, 2.0), 1L -> Seq(2.0, 3.0),
      2L -> Seq(4.0, 7.0)))
    val books = ProductQuantizer.train(e, "v", d = 2, m = 1, k = 1,
      iters = 1)
    val c = books.head.cents.head
    assert(c.v === Seq((1e9 + 2e9 + 4e9) / 1e9 / 3,
      (2e9 + 3e9 + 7e9) / 1e9 / 3))
  }

  test("stored codes are m integers regardless of d") {
    val e = frame((0L until 20L).map(id =>
      id -> (0 until 16).map(j => math.cos(id * 13 + j).toDouble)))
    val books = ProductQuantizer.train(e, "v", d = 16, m = 4, k = 4,
      iters = 2)
    assert(books.length === 4)
    val enc = ProductQuantizer.encodeDecode(e, "v", books)
    val codes = enc.select("codes").collect().map(_.getSeq[Int](0))
    assert(codes.forall(_.length === 4))
    assert(codes.forall(_.forall(c => c >= 0 && c < 4)))
    // reconstruction always has full dimensionality
    assert(enc.select("dv").collect().forall(_.getSeq[Double](0).length === 16))
  }

  test("materialized code store ≡ in-query IVF-PQ, with dynamic " +
    "partition pruning, storing only m ints per row") {
    import graft.queries.tbl
    val e = tbl(spark, sf(), "embeddings")
      .filter(col("embedding").isNotNull)
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
      .withColumn("nrm", expr("dot_product(v, v)"))
    val cents = KMeans.lloyd(e, 8, 2)
    val books = ProductQuantizer.train(e, "v", 64, 4, 8, 2)
    val path = java.nio.file.Files.createTempDirectory("pq_store").toString
    ProductQuantizer.buildStore(e, "v", books, cents, path)

    // stored schema is exactly (vec_id, codes) + the bucket partition key
    val stored = spark.read.parquet(path)
    assert(stored.columns.sorted === Seq("bucket", "codes", "vec_id"))
    assert(stored.select("codes").head().getSeq[Int](0).length === 4)

    val queries = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"))
    val viaStore = ProductQuantizer.probeStore(
      spark, path, queries, books, cents, nProbe = 2, topK = 5)
      .orderBy("query_id", "rnk")
    val direct = graft.queries.IvfPqQuery.knnIvfPq.spark(spark, sf())
    val key = (df: org.apache.spark.sql.DataFrame) => df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(key(viaStore) === key(direct))
    assert(key(direct).nonEmpty)

    viaStore.collect() // finalize AQE before reading the executed plan
    assert(viaStore.queryExecution.executedPlan.toString
      .toLowerCase.contains("dynamicpruning"),
      "PQ store scan has no dynamic partition pruning")
  }

  test("append-to-store ≡ rebuild bit-exactly; drift report covers both legs") {
    import graft.queries.tbl
    val e = tbl(spark, sf(), "embeddings")
      .filter(col("embedding").isNotNull)
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
      .withColumn("nrm", expr("dot_product(v, v)"))
    val half = e.agg(max("vec_id")).head().getLong(0) / 2
    val tr = e.filter(col("vec_id") <= half)
    val ap = e.filter(col("vec_id") > half)
    // models FROZEN on the first half — the append-only deployment shape
    val cents = KMeans.lloyd(tr, 8, 2)
    val books = ProductQuantizer.train(tr, "v", 64, 4, 8, 2)
    val appended = java.nio.file.Files
      .createTempDirectory("pq_app").toString + "/store"
    val rebuilt = java.nio.file.Files
      .createTempDirectory("pq_reb").toString + "/store"
    ProductQuantizer.buildStore(tr, "v", books, cents, appended)
    ProductQuantizer.appendToStore(ap, "v", books, cents, appended)
    ProductQuantizer.buildStore(e, "v", books, cents, rebuilt)

    // bucket + codes depend only on the frozen models and the row, so the
    // appended store holds exactly the rebuilt store's rows
    val key = (p: String) => spark.read.parquet(p).collect()
      .map(r => (r.getAs[Long]("vec_id"),
        r.getAs[scala.collection.Seq[Int]]("codes").toSeq,
        r.getAs[Int]("bucket"))).sortBy(_._1).toSeq
    assert(key(appended) === key(rebuilt))
    assert(key(appended).nonEmpty)

    // and the served answers are identical too
    val queries = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"))
    val probeKey = (p: String) => ProductQuantizer.probeStore(
        spark, p, queries, books, cents, nProbe = 2, topK = 10)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(probeKey(appended) === probeKey(rebuilt))

    // drift report: one row per leg, counts partition the corpus, errors
    // are finite and non-negative (cos ≤ 1 up to rounding)
    val decoded = ProductQuantizer
      .decodeFromCodes(spark.read.parquet(appended), books)
      .select("vec_id", "dv", "dn")
    val drift = ProductQuantizer.driftReport(
      decoded.join(e, "vec_id")
        .withColumn("leg",
          when(col("vec_id") <= half, "train").otherwise("append")),
      "leg").orderBy("leg").collect()
    assert(drift.map(_.getString(0)).toSeq === Seq("append", "train"))
    assert(drift.map(_.getAs[Long]("n")).sum === e.count())
    drift.foreach { r =>
      val q = r.getAs[Double]("mean_qerr")
      assert(!q.isNaN && q > -1e-6 && q < 2.0, s"mean_qerr out of range: $q")
    }
  }

  test("null vectors are excluded; empty input trains nothing") {
    val e = frame(Seq(0L -> Seq(1.0, 0.0), 1L -> Seq(0.0, 1.0)))
      .union(frame(Seq(9L -> Seq(0.0)))
        .withColumn("v", lit(null).cast("array<double>")))
    val books = ProductQuantizer.train(e, "v", d = 2, m = 1, k = 2,
      iters = 1)
    assert(ProductQuantizer.encodeDecode(e, "v", books)
      .select("vec_id").collect().map(_.getLong(0)).sorted === Seq(0L, 1L))
    assert(ProductQuantizer.train(frame(Seq.empty), "v", 2, 1, 2, 1).isEmpty)
  }
}
