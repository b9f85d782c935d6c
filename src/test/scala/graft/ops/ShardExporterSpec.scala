package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Shard export contract: the written layout is shard-partitioned, loses
  * nothing, balances within LPT's bound, and the model round-trip
  * (KMeans save/load) preserves serving behavior exactly.
  */
class ShardExporterSpec extends SparkSpec {

  test("export writes shard= partitions, loses no docs, balances tokens") {
    val docs = graft.queries.tbl(spark, sf(), "documents")
      .select(col("doc_id"), col("text"),
        size(split(col("text"), " ")).cast("long").as("tokens"))
    val path = java.nio.file.Files
      .createTempDirectory("shard_export").toString + "/shards"
    val stats = ShardExporter.export(
      docs, "tokens", Seq(col("doc_id")), 4, path)

    assert(stats.map(_.shard) === Seq(0L, 1L, 2L, 3L))
    assert(stats.map(_.nDocs).sum === docs.count())
    // LPT deal: every shard within 10% of the equal share on this corpus
    stats.foreach(s =>
      assert(math.abs(s.balanceRatio - 1.0) < 0.1, stats.toString))

    // layout: hive shard= dirs exist and partition pruning applies
    val one = spark.read.parquet(path).filter(col("shard") === 2)
    assert(one.count() === stats(2).nDocs)
    val scan = one.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("shard"),
      scan)
    // no document lost or duplicated across shard files
    val ids = spark.read.parquet(path).select("doc_id")
      .collect().map(_.getLong(0)).sorted
    val orig = docs.select("doc_id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq === orig.toSeq)
  }

  test("KMeans model save/load round-trips and serves identically") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val e = graft.queries.tbl(spark, sf(), "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
      .withColumn("nrm", expr("dot_product(v, v)"))
    val trained = KMeans.lloyd(e, 4, 2)
    val dir = java.nio.file.Files
      .createTempDirectory("kmeans_model").toString + "/model"
    KMeans.save(spark, trained, dir)
    val loaded = KMeans.load(spark, dir)
    assert(loaded === trained, "model must round-trip bit-identically")

    val a = e.withColumn("b", VectorIndex.assignBucket(trained))
      .select("vec_id", "b").collect().map(r => r.getLong(0) -> r.getInt(1))
    val b = e.withColumn("b", VectorIndex.assignBucket(loaded))
      .select("vec_id", "b").collect().map(r => r.getLong(0) -> r.getInt(1))
    assert(a.toMap === b.toMap, "loaded model must assign identically")
  }
}
