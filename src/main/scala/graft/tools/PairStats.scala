package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale diagnostic for the pair-emitting dedup contracts: the exact
  * CANDIDATE-pair count Σ C(n,2) each LSH leg's salted buckets generate
  * at a given scale factor, plus bucket-shape stats. Candidate pairs are
  * the true work unit of a bucket-expansion dedup — when a scale curve
  * shows a pair query's last-decade exponent near 2 while every other
  * leg is ~1, this tool answers WHICH kind of quadratic it is:
  * time ∝ candidates (the corpus's near-dup cluster sizes grew with SF,
  * so the pair OUTPUT is quadratic and the engine is work-linear) vs
  * time >> candidates (an actual plan defect). The count itself is one
  * cheap aggregate over the banded frame — pairs are never materialized.
  *
  * Usage: runMain graft.tools.PairStats [sfDir...]
  */
object PairStats {
  def main(args: Array[String]): Unit = {
    val sfDirs =
      if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.ensureRegistered(spark)

    def stats(banded: DataFrame, keys: Seq[String], idCol: String)
        : (Long, Long, Long, Long) = {
      val salted = graft.ops.SkewGuard.saltOversized(banded, keys, idCol)
      val sizes = salted.groupBy((keys :+ "salt").map(col): _*)
        .agg(count(lit(1)).as("n"))
      val r = sizes.agg(
        coalesce(sum(expr("n * (n - 1) div 2")), lit(0L)).as("pairs"),
        coalesce(max(col("n")), lit(0L)).as("max_bucket"),
        count(lit(1)).as("buckets"),
        coalesce(sum(col("n")), lit(0L)).as("rows")).head()
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }

    val legs = Seq[(String, String => (DataFrame, Seq[String], String))](
      "simhash60" -> { dir =>
        val docs = graft.queries.tbl(spark, dir, "documents")
          .filter(col("text").isNotNull && col("lang").isNotNull)
          .select(col("doc_id"), col("lang"),
            expr("simhash60(split(text, ' '))").as("sh"))
        val bands = docs.select(col("doc_id"), col("lang"),
          posexplode(expr("transform(sequence(0, 5), b -> " +
            "(sh div cast(pow(2, b * 10) as bigint)) % 1024)")))
          .withColumnRenamed("pos", "band").withColumnRenamed("col", "bbits")
        (bands, Seq("band", "bbits", "lang"), "doc_id")
      },
      "minhash" -> { dir =>
        // mirrors q_dedup_minhash's banding exactly: 3-word shingles,
        // native 16-slot signature, 4 bands of 4
        val docs = graft.queries.tbl(spark, dir, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("w"))
          .filter(expr("size(w) >= 3"))
          .select(col("doc_id"),
            expr("""minhash_sig(array_distinct(transform(
                      sequence(1, size(w) - 2),
                      i -> concat_ws(' ', slice(w, i, 3)))))""").as("sig"))
        val bands = docs.select(col("doc_id"),
          posexplode(expr(
            "transform(sequence(0, 3), b -> slice(sig, b * 4 + 1, 4))")))
          .withColumnRenamed("pos", "band").withColumnRenamed("col", "bvals")
        (bands, Seq("band", "bvals"), "doc_id")
      })

    val out = sfDirs.map { dir =>
      val legJson = legs.map { case (name, mk) =>
        val (banded, keys, id) = mk(dir)
        val (pairs, maxB, buckets, rows) = stats(banded, keys, id)
        s""""$name":{"candidate_pairs":$pairs,"max_salted_bucket":$maxB,""" +
          s""""buckets":$buckets,"banded_rows":$rows}"""
      }.mkString(",")
      s""""${dir.split('/').last}":{$legJson}"""
    }.mkString(",")
    println(s"""{"metric":"pair_stats","sf":{$out}}""")
    spark.stop()
  }
}
