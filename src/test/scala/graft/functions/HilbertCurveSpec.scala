package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.{StatsLedger, ZOrder}
import graft.ops.StatsLedger.Box

/** Hilbert-curve expression + layout: the defining continuity property,
  * index↔axes bijectivity, the ZValue null contract, codegen/interpreted
  * agreement, and the measured pruning advantage over Morton.
  */
class HilbertCurveSpec extends SparkSpec {
  import spark.implicits._

  private def h(vals: Int*): java.lang.Long = {
    val arr = org.apache.spark.sql.catalyst.util.ArrayData
      .toArrayData(vals.toArray)
    HilbertValue.index(arr)
  }

  test("continuity: consecutive curve positions are axis-neighbors " +
    "(unit step in exactly one dimension) — in 2, 3 and 4 dims") {
    for (d <- 2 to 4) {
      // sample several windows across the 64-bit range, including the
      // d=4 signed-boundary window where a sign bug would break order
      val starts: Seq[Long] =
        if (d == 4) Seq(Long.MinValue, -1000L, 0L, 1L << 40)
        else Seq(0L, 12345L, 1L << 20)
      for (s <- starts; step <- 0 until 256) {
        val a = HilbertValue.axesOf(s + step, d)
        val b = HilbertValue.axesOf(s + step + 1, d)
        val diffs = a.zip(b).map { case (x, y) => math.abs(x - y) }
        assert(diffs.sum === 1 && diffs.max === 1,
          s"d=$d h=${s + step}: ${a.toSeq} -> ${b.toSeq} is not a unit step")
      }
    }
  }

  test("bijectivity: axes -> index -> axes round-trips") {
    for (d <- 2 to 4) {
      val rnd = new scala.util.Random(7 * d)
      for (_ <- 0 until 200) {
        val coords = Array.fill(d)(rnd.nextInt(0x10000))
        val idx = h(coords.toSeq: _*)
        assert(idx != null)
        assert(HilbertValue.axesOf(idx.longValue(), d).toSeq === coords.toSeq)
      }
    }
  }

  test("signed long order follows the curve in 4 dims (and Morton's " +
    "4-dim codes now do too)") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    // curve position 0 must compare BELOW the last position under
    // signed ordering, for both curves
    val first4 = HilbertValue.axesOf(Long.MinValue, 4)
    val last4 = HilbertValue.axesOf(Long.MaxValue, 4)
    assert(h(first4.toSeq: _*) < h(last4.toSeq: _*))
    def z(vals: Int*): Long =
      Seq(1).toDF("i")
        .select(call_function("z_value",
          array(vals.map(lit): _*)).as("z")).head().getLong(0)
    // Morton: dim-0 rank 0x8000 (the old sign seam) must sort above 0
    assert(z(0, 0, 0, 0) < z(0x8000, 0, 0, 0))
    assert(z(0x7fff, 0xffff, 0xffff, 0xffff) < z(0x8000, 0, 0, 0))
  }

  test("null contract matches z_value: null element / bad arity / " +
    "out-of-range rank yield null, not 0") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val rows = Seq((Some(1), Some(2)), (None, Some(2)), (Some(70000), Some(1)))
      .toDF("a", "b")
      .select(call_function("hilbert_value",
        array(col("a"), col("b"))).as("h"))
      .collect()
    assert(!rows(0).isNullAt(0))
    assert(rows(1).isNullAt(0))
    assert(rows(2).isNullAt(0))
    val one = Seq(1).toDF("a")
      .select(call_function("hilbert_value", array(col("a"))).as("h"))
      .collect()
    assert(one(0).isNullAt(0), "arity 1 must be null")
  }

  test("codegen path equals the direct static call") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val df = spark.range(0, 2000).toDF("id")
      .withColumn("a", (col("id") * 37 % 65536).cast("int"))
      .withColumn("b", (col("id") * 101 % 65536).cast("int"))
    val viaSql = df.select(col("a"), col("b"),
      call_function("hilbert_value", array(col("a"), col("b"))).as("h"))
      .collect()
    viaSql.foreach { r =>
      assert(r.getLong(2) === h(r.getInt(0), r.getInt(1)).longValue())
    }
  }

  test("layout: Hilbert files carry tighter boxes than Morton on the " +
    "same uniform data — smaller total bbox area, equal answers") {
    val dir = java.nio.file.Files.createTempDirectory("hilb").toString
    val df = spark.range(0, 40000).toDF("id")
      .withColumn("a", col("id") * 7919 % 1000) // uniform-ish, decorrelated
      .withColumn("b", col("id") * 104729 % 1000)
    val nFiles = 16
    ZOrder.write(df, Seq("a", "b"), nFiles, s"$dir/morton")
    ZOrder.write(df, Seq("a", "b"), nFiles, s"$dir/hilbert",
      curve = "hilbert")
    for (l <- Seq("morton", "hilbert"))
      StatsLedger.build(spark, s"$dir/$l", s"$dir/${l}_ledger",
        Seq("a", "b"))

    val boxes = Seq(Box.between("a", 300L, 420L), Box.between("b", 550L, 700L))
    def answer(l: String) = StatsLedger
      .readPruned(spark, s"$dir/$l", s"$dir/${l}_ledger", boxes)
      .agg(count(lit(1)), sum("a"), sum("b")).collect().head
    assert(answer("morton") === answer("hilbert"))

    // total box area: sum over files of (a-span * b-span) from the ledger
    def area(l: String): Double =
      spark.read.parquet(s"$dir/${l}_ledger")
        .select(((col("max_a") - col("min_a") + 1) *
          (col("max_b") - col("min_b") + 1)).cast("double").as("ar"))
        .agg(sum("ar")).head().getDouble(0)
    val (ma, ha) = (area("morton"), area("hilbert"))
    info(f"total bbox area: morton=$ma%.0f hilbert=$ha%.0f " +
      f"(ratio ${ha / ma}%.2f)")
    // the continuity advantage is structural, not sampling luck; allow
    // range-boundary sampling wobble but require a real gap
    assert(ha < ma * 0.95,
      "hilbert layout should carry materially tighter boxes")

    def survivors(l: String) =
      StatsLedger.pruneFiles(spark, s"$dir/${l}_ledger", boxes).size
    info(s"box survivors of $nFiles: morton=${survivors("morton")} " +
      s"hilbert=${survivors("hilbert")}")
    assert(survivors("hilbert") <= survivors("morton"),
      "tighter boxes must never prune worse on the same box")
  }
}
