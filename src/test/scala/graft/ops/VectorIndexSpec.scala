package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.SimilarityQueries

/** The materialized IVF index must (1) answer exactly like the in-query
  * IVF formulation, and (2) actually prune: the probe scan's partition
  * filter must be a runtime (dynamicpruning) subquery fed by the
  * broadcast probe frame, so only nprobe bucket directories are read.
  */
class VectorIndexSpec extends SparkSpec {

  test("partition-pruned probe ≡ in-query IVF, with dynamic partition " +
    "pruning in the index scan") {
    val viaStore = SimilarityQueries.knnIvfStore.spark(spark, sf())
    val direct = SimilarityQueries.knnIvf.spark(spark, sf())
    val key = (df: org.apache.spark.sql.DataFrame) => df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(key(viaStore) === key(direct))
    assert(key(direct).nonEmpty)

    viaStore.collect() // finalize AQE before reading the executed plan
    val p = viaStore.queryExecution.executedPlan.toString
    assert(p.toLowerCase.contains("dynamicpruning"),
      "index scan has no dynamic partition pruning:\n" + p.take(3000))
  }

  test("appendToIvf ≡ rebuild: frozen centroids, appended tail — " +
    "identical probe answers, DPP retained, compaction preserves them") {
    import graft.queries.tbl
    val e = tbl(spark, sf(), "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
      .withColumn("nrm", expr("dot_product(v, v)"))
    val cents = VectorIndex.centroidsFrom(e, 32)
    val queries = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"))
    def answers(path: String) = VectorIndex
      .probe(spark, path, queries, cents, nProbe = 4, topK = 10)
      .orderBy("query_id", "rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq

    val incr = java.nio.file.Files.createTempDirectory("ivf_incr").toString
    val full = java.nio.file.Files.createTempDirectory("ivf_full").toString
    // base corpus, then two appended batches (centroids frozen throughout)
    val isTail = col("vec_id") % 5 === 4
    val isTail2 = col("vec_id") % 5 === 3
    VectorIndex.buildIvf(e.filter(!isTail && !isTail2), cents, incr)
    VectorIndex.appendToIvf(e.filter(isTail), cents, incr)
    VectorIndex.appendToIvf(e.filter(isTail2), cents, incr)
    VectorIndex.buildIvf(e, cents, full)
    val expected = answers(full)
    assert(expected.nonEmpty)
    assert(answers(incr) === expected)

    // the appended store still dynamic-partition-prunes
    val probed = VectorIndex.probe(spark, incr, queries, cents, 4, 10)
    probed.collect()
    assert(probed.queryExecution.executedPlan.toString
      .toLowerCase.contains("dynamicpruning"))

    // per-bucket compaction folds the append's small files (3 write
    // batches → 1 file per bucket) without changing any answer
    val before = new java.io.File(incr).listFiles()
      .filter(_.getName.startsWith("bucket="))
      .map(_.listFiles().count(_.getName.endsWith(".parquet"))).sum
    val reports = VectorIndex.compactIvf(spark, incr)
    assert(reports.nonEmpty)
    val after = new java.io.File(incr).listFiles()
      .filter(_.getName.startsWith("bucket="))
      .map(_.listFiles().count(_.getName.endsWith(".parquet"))).sum
    assert(after < before, s"compaction did not shrink files: $before -> $after")
    assert(answers(incr) === expected)
  }
}
