package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Boundary robustness: the composite operators must degrade to empty /
  * identity on degenerate inputs instead of throwing — at 100 TB a daily
  * pipeline WILL eventually see an empty partition, a single-document
  * batch, or a filter that matches nothing, and "crashes at 3am on the
  * empty Sunday batch" is the classic operational failure.
  */
class EdgeCasesSpec extends SparkSpec {

  private def emptyDocs = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  test("signature store: empty corpus builds an empty store; dedup " +
    "against it finds nothing and does not throw") {
    import spark.implicits._
    val sigs = SignatureStore.signatures(emptyDocs)
    assert(sigs.count() === 0L)
    val one = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    assert(SignatureStore.incrementalNearDups(sigs, one).count() === 0L)
  }

  test("signature store: single-document corpus yields no pairs") {
    import spark.implicits._
    val one = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    assert(SignatureStore.incrementalNearDups(
      SignatureStore.signatures(emptyDocs), one).count() === 0L)
    // doc too short to shingle (< 3 words) is silently excluded, not an error
    val short = Seq((2L, "a b")).toDF("doc_id", "text")
    assert(SignatureStore.signatures(short).count() === 0L)
  }

  test("dedup clusters: empty pair set produces an empty labeling") {
    import spark.implicits._
    val noPairs = Seq.empty[(Long, Long)].toDF("ai", "bi")
    assert(DedupClusters.connectedComponents(noPairs).count() === 0L)
  }

  test("global rank: empty input survives and a single row ranks 1") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Double)].toDF("id", "v")
    assert(GlobalRank.withRowNumber(empty, Seq(col("v"))).count() === 0L)
    val one = GlobalRank.withRowNumber(
      Seq((7L, 1.5)).toDF("id", "v"), Seq(col("v"))).collect()
    assert(one.length === 1)
    assert(one.head.getAs[Long]("rn") === 1L)
  }

  test("KLL: quantile of an empty sketch is null, merge of empties is " +
    "empty (no exception)") {
    import spark.implicits._
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val r = Seq.empty[Double].toDF("v")
      .agg(expr("kll_sketch_quantile(kll_sketch_agg(v, 200), 0.5D)").as("q"))
      .head()
    assert(r.isNullAt(0))
  }

  test("quality gates on an empty frame: zero rows, zero violations") {
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("value", DoubleType)))
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    val (inst, obs) = QualityGates.instrument(empty, "edge_empty",
      nullCols = Seq("user_id"), rangeCols = Map("value" -> (0.0, 1.0)))
    inst.count()
    assert(obs.get("rows") === 0L)
    assert(QualityGates.violations(obs) === Seq.empty)
  }
}
