package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.StatsLedger.Box

/** Quantile z-ranks under skew: linear min/max scaling collapses a
  * power-law column into one Morton cell (one outlier stretches the
  * range so 99% of rows rank ~0), gutting second-dimension pruning;
  * quantile cutpoints spread the same mass across the full rank range.
  * Both layouts stay answer-exact — the spec measures the PRUNING gap.
  */
class ZOrderSkewSpec extends SparkSpec {
  import spark.implicits._

  test("on a power-law column, quantile z-ranks prune a mid-mass band; " +
    "linear ranks do not") {
    val dir = java.nio.file.Files.createTempDirectory("zskew").toString
    // a: uniform 0..999; b: power-law with a huge outlier tail —
    // 90% of rows in [0, 100), a few up to 1e9
    val df = spark.range(0, 20000).toDF("id")
      .withColumn("a", col("id") % 1000)
      .withColumn("b",
        when(col("id") % 10 === 0,
          (pow(lit(10.0), (col("id") % 9).cast("double") + 1))
            .cast("long"))
          .otherwise(col("id") % 100))
    val nFiles = 16
    ZOrder.write(df, Seq("a", "b"), nFiles, s"$dir/lin")
    ZOrder.writeQuantile(df, Seq("a", "b"), nFiles, s"$dir/qnt")
    for (l <- Seq("lin", "qnt"))
      StatsLedger.build(spark, s"$dir/$l", s"$dir/${l}_ledger",
        Seq("a", "b"))

    // answers identical on both layouts
    val boxes = Seq(Box.between("b", 20L, 26L))
    def answer(l: String) = StatsLedger
      .readPruned(spark, s"$dir/$l", s"$dir/${l}_ledger", boxes)
      .agg(count(lit(1)), sum("a")).collect().head
    assert(answer("lin") === answer("qnt"))

    def survivors(l: String) =
      StatsLedger.pruneFiles(spark, s"$dir/${l}_ledger", boxes).size
    def total(l: String) =
      StatsLedger.pruneFiles(spark, s"$dir/${l}_ledger", Nil).size
    val (linKept, linAll) = (survivors("lin"), total("lin"))
    val (qntKept, qntAll) = (survivors("qnt"), total("qnt"))
    info(s"b-band [20,26]: linear keeps $linKept/$linAll, " +
      s"quantile keeps $qntKept/$qntAll")
    // a narrow band: ~8% of the mass. Linear scaling squeezes the whole
    // non-outlier population (b < 100 out of a 1e9 range) into rank 0 of
    // 65535, so the b dimension carries no layout signal at all — the
    // band survives in (almost) every file
    assert(linKept > linAll * 3 / 4,
      "expected linear layout to prune poorly on the power-law dim")
    // quantile ranks spread that mass: the band must confine
    // repartitionByRange samples its boundaries, so the kept count
    // wobbles by a file between runs (observed 8-9 of 16); assert a
    // sampling-robust cut, not an exact half
    assert(qntKept * 8 <= qntAll * 5,
      s"quantile layout should drop ~40%+ of candidate files: " +
        s"$qntKept/$qntAll")
    assert(qntKept < linKept)
  }
}
