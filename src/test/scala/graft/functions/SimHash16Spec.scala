package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimHash16Spec extends SparkSpec {

  test("matches the composable 16-sweep formulation bit-for-bit on real docs") {
    GraftFunctions.ensureRegistered(spark)
    val rows = graft.queries.tbl(spark, sf(), "documents")
      .select(expr("transform(split(text, ' '), t -> md5num(t))").as("th"),
        expr("simhash16(split(text, ' '))").as("fast"))
      .select(col("fast"),
        expr("""aggregate(transform(sequence(0, 15), i ->
                   case when 2 * size(filter(th, h ->
                          (h div cast(pow(2, i) as bigint)) % 2 = 1))
                          > size(th)
                        then cast(pow(2, i) as bigint) else 0L end),
                 0L, (acc, x) -> acc + x)""").as("ref"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1), r.toString))
  }

  test("signature is 16-bit and majority semantics hold on a known case") {
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    val rows = Seq(
      Tuple1("a a a b"), // 'a' majority: sig == hash('a') & 0xffff where unambiguous
      Tuple1("x"))
      .toDF("text")
      .select(expr("simhash16(split(text, ' '))").as("sig"),
        expr("md5num(split(text, ' ')[0]) % 65536").as("firstHashLow"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(0) >= 0 && r.getLong(0) < 65536)
    }
    // single token: signature == low 16 bits of that token's hash
    assert(rows(1).getLong(0) === rows(1).getLong(1))
  }
}
