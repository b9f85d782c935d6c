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
  * [[candidatePairs]] is the reusable core; [[ScaleCurve]] calls it per
  * decade to normalize the pair legs' wall time to ns/candidate-pair,
  * so an ENGINE regression can no longer hide inside corpus-constructed
  * candidate growth (r10 verdict item 7).
  *
  * Usage: runMain graft.tools.PairStats [sfDir...]
  */
object PairStats {

  final case class LegStats(
      pairs: Long, maxBucket: Long, buckets: Long, rows: Long)

  private def stats(banded: DataFrame, keys: Seq[String], idCol: String)
      : LegStats = {
    val salted = graft.ops.SkewGuard.saltOversized(banded, keys, idCol,
      metricName = s"pair_stats_${System.nanoTime()}")
    val sizes = salted.groupBy((keys :+ "salt").map(col): _*)
      .agg(count(lit(1)).as("n"))
    val r = sizes.agg(
      coalesce(sum(expr("n * (n - 1) div 2")), lit(0L)).as("pairs"),
      coalesce(max(col("n")), lit(0L)).as("max_bucket"),
      count(lit(1)).as("buckets"),
      coalesce(sum(col("n")), lit(0L)).as("rows")).head()
    LegStats(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  /** The banded frame of each pair-emitting dedup leg, mirroring the
    * production queries' banding EXACTLY (same shingles, signatures,
    * bands, and skew-guard keys), minus the verify step — so the pair
    * counts are the true candidate workload of those queries.
    */
  private def legs(spark: SparkSession)
      : Seq[(String, String => Option[(DataFrame, Seq[String], String)])] =
    Seq(
      "simhash60" -> { dir =>
        val docs = graft.queries.tbl(spark, dir, "documents")
          .filter(col("text").isNotNull && col("lang").isNotNull)
          .select(col("doc_id"), col("lang"),
            expr("simhash60(split(text, ' '))").as("sh"))
        val bands = docs.select(col("doc_id"), col("lang"),
          posexplode(expr("transform(sequence(0, 5), b -> " +
            "(sh div cast(pow(2, b * 10) as bigint)) % 1024)")))
          .withColumnRenamed("pos", "band").withColumnRenamed("col", "bbits")
        Some((bands, Seq("band", "bbits", "lang"), "doc_id"))
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
        Some((bands, Seq("band", "bvals"), "doc_id"))
      },
      "embedding_lsh" -> { dir =>
        // mirrors q_dedup_embedding_lsh's random-hyperplane banding:
        // id-arithmetic plane pairing, 8 tables × ≤4 planes,
        // (table, signature, label) buckets
        val e = graft.queries.tbl(spark, dir, "embeddings")
          .filter(col("embedding").isNotNull && col("label").isNotNull)
          .select(col("vec_id"), col("label"),
            expr("transform(embedding, x -> cast(x as double))").as("v"))
        val byId = e.filter(col("vec_id") < 64)
          .select(col("vec_id"), col("v")).collect()
          .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
        def planes(t: Int) = (0 until 4).flatMap { i =>
          for (a <- byId.get(8L * t + i); b <- byId.get(8L * t + 4 + i))
            yield (i, a.zip(b).map { case (x, y) => x - y })
        }
        val tables = (0 until 8).filter(t => planes(t).nonEmpty)
        if (tables.isEmpty) None
        else {
          def sigCol(t: Int) = planes(t).map { case (i, p) =>
            when(call_function("dot_product", col("v"), typedLit(p)) >= 0,
              lit(1L << i)).otherwise(lit(0L))
          }.reduce(_ + _)
          val sigs = e.select(col("vec_id"), col("label"),
            explode(array(tables.map(t =>
              struct(lit(t.toLong).as("t"), sigCol(t).as("sig"))): _*))
              .as("ts"))
            .select(col("vec_id"), col("label"),
              col("ts.t").as("t"), col("ts.sig").as("sig"))
          Some((sigs, Seq("t", "sig", "label"), "vec_id"))
        }
      })

  /** Exact candidate-pair counts per leg for one sfDir — the pair-leg
    * work normalizer ScaleCurve divides wall time by.
    */
  def candidatePairs(spark: SparkSession, dir: String): Map[String, Long] =
    legStats(spark, dir).map { case (n, s) => n -> s.pairs }

  def legStats(spark: SparkSession, dir: String): Map[String, LegStats] = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    legs(spark).flatMap { case (name, mk) =>
      mk(dir).map { case (banded, keys, id) =>
        name -> stats(banded, keys, id)
      }
    }.toMap
  }

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

    val out = sfDirs.map { dir =>
      val legJson = legStats(spark, dir).toSeq.sortBy(_._1)
        .map { case (name, s) =>
          s""""$name":{"candidate_pairs":${s.pairs},""" +
            s""""max_salted_bucket":${s.maxBucket},""" +
            s""""buckets":${s.buckets},"banded_rows":${s.rows}}"""
        }.mkString(",")
      s""""${dir.split('/').last}":{$legJson}"""
    }.mkString(",")
    println(s"""{"metric":"pair_stats","sf":{$out}}""")
    spark.stop()
  }
}
