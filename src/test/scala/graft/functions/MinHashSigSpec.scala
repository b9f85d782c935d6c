package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MinHashSigSpec extends SparkSpec {

  test("matches the composable HOF formulation slot-for-slot") {
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    val P = MinHashSig.P
    val aArr = MinHashSig.A.mkString("array(", "L, ", "L)")
    val bArr = MinHashSig.B.mkString("array(", "L, ", "L)")
    val df = Seq(
      Seq("a b c", "b c d", "c d e"),
      Seq("x y z"),
      Seq("one two three", "two three four", "one two three"))
      .toDF("s").repartition(2)
    val rows = df.select(
      expr("minhash_sig(s)").as("fast"),
      expr(s"""transform(sequence(0, 15), j ->
                 array_min(transform(transform(s, x -> md5num(x) % $P), h ->
                   (element_at($aArr, j + 1) * h
                    + element_at($bArr, j + 1)) % $P)))""").as("ref"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1), r.toString)
    }
  }

  test("duplicate shingles cannot change the signature") {
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    val rows = Seq((Seq("p q r", "q r s"), Seq("p q r", "q r s", "p q r")))
      .toDF("a", "b")
      .select(expr("minhash_sig(a)").as("sa"), expr("minhash_sig(b)").as("sb"))
      .head()
    assert(rows.getSeq[Long](0) === rows.getSeq[Long](1))
  }

  test("stays in whole-stage codegen, 16 slots, null-safe") {
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    val df = Seq(Some(Seq("a b c")), None).toDF("s").repartition(2)
    val out = df.select(expr("minhash_sig(s)").as("sig")).collect()
    assert(out.count(_.isNullAt(0)) === 1)
    assert(out.filterNot(_.isNullAt(0)).head.getSeq[Long](0).length === 16)
    val qdf = df.repartition(2).select(expr("minhash_sig(s)"))
    qdf.collect()
    assert(qdf.queryExecution.executedPlan.toString.contains("*(1) Project"))
  }
}
