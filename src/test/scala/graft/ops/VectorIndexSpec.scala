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
}
