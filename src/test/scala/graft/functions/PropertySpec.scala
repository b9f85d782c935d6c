package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property-based checks of the native kernels against independent
  * reference implementations and their algebraic laws — randomized
  * inputs catch the edge shapes example-based specs miss. Generators are
  * driven manually (fixed seeds, bounded rounds) so runs are
  * reproducible and the Spark-backed properties stay fast.
  */
class PropertySpec extends SparkSpec {

  private val token = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val tokens = Gen.listOfN(12, token)

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("jaccard_sim equals a set-based reference on random arrays") {
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    val pairs = samples(Gen.zip(tokens, tokens), 40)
    val rows = pairs.toDF("a", "b")
      .select(expr("jaccard_sim(a, b)")).collect()
    rows.zip(pairs).foreach { case (r, (a, b)) =>
      val (sa, sb) = (a.toSet, b.toSet)
      val expected = (sa & sb).size.toDouble / (sa | sb).size.toDouble
      assert(java.lang.Double.compare(r.getDouble(0), expected) == 0,
        s"a=$a b=$b")
    }
  }

  private def arr(xs: Seq[String]) =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      xs.map(org.apache.spark.unsafe.types.UTF8String.fromString))

  test("minhash_sig is permutation- and duplication-invariant, and " +
    "sig(a ++ b) == slotwise min(sig(a), sig(b))") {
    def sig(xs: Seq[String]) =
      (0 until 16).map(MinHashSig.compute(arr(xs)).getLong)
    val rnd = new scala.util.Random(7)
    samples(Gen.zip(tokens, tokens), 50).foreach { case (a, b) =>
      val base = sig(a)
      assert(sig(rnd.shuffle(a)) === base, s"permutation changed sig: $a")
      assert(sig(a ++ a) === base, s"duplication changed sig: $a")
      val slotMin = base.zip(sig(b)).map { case (x, y) => math.min(x, y) }
      assert(sig(a ++ b) === slotMin, s"merge law failed: $a $b")
    }
  }

  test("simhash16 is order-invariant and bounded to 16 bits") {
    val rnd = new scala.util.Random(11)
    samples(tokens, 50).foreach { a =>
      val s = SimHash16.compute(arr(a))
      assert(s >= 0 && s < 65536, s"out of range: $a -> $s")
      assert(SimHash16.compute(arr(rnd.shuffle(a))) === s,
        s"order changed sig: $a")
    }
  }

  test("native as-of join equals the union+window form on random event sets") {
    import spark.implicits._
    val keyGen = Gen.chooseNum(1L, 5L)
    val tsGen = Gen.chooseNum(0L, 50L)
    val caseGen = Gen.zip(
      Gen.listOfN(30, Gen.zip(keyGen, tsGen)),
      Gen.listOfN(15, Gen.zip(keyGen, tsGen)))
    samples(caseGen, 5).foreach { case (l, r) =>
      val left = l.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, t) }.toDF("id", "k", "t")
      // right unique per (k, t) so "latest at or before" is well-defined
      val right = r.distinct.zipWithIndex
        .map { case ((k, t), i) => (k, t, 1000L + i) }.toDF("k", "t", "pid")
      def norm(df: org.apache.spark.sql.DataFrame) =
        df.select("id", "asof_pid").orderBy("id").collect()
          .map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1)))
          .toSeq
      val viaWindow = norm(graft.ops.AsOfJoin.asOf(
        left, right, "k", "t", Seq("pid")))
      val viaNative = norm(graft.plans.AsOfJoinNative.asOf(
        left, right, "k", "t", Seq("pid")))
      assert(viaNative === viaWindow, s"l=$l r=$r")
    }
  }

  test("bloom filter has NO false negatives on random key sets " +
    "(the property q_bloom_prejoin's correctness rests on)") {
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    val keysGen = Gen.listOfN(200, Gen.chooseNum(Long.MinValue, Long.MaxValue))
    samples(keysGen, 5).foreach { keys =>
      val distinct = keys.distinct
      val bf = distinct.toDF("k")
        .agg(expr("bloom_filter_agg(xxhash64(k), 10000L, 65536L)").as("bf"))
        .head().getAs[Array[Byte]]("bf")
      val hits = distinct.toDF("k")
        .select(call_function("might_contain",
          typedLit(bf), expr("xxhash64(k)")).as("hit"))
        .collect().map(_.getBoolean(0))
      assert(hits.forall(identity),
        s"bloom dropped an inserted key (${hits.count(!_)} misses)")
    }
  }
}
