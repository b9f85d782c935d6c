package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SaltingSpec extends SparkSpec {

  test("salted aggregation matches plain groupBy on a skewed key") {
    import spark.implicits._
    // one hot key with 10k rows, many cold keys
    val hot = (1 to 10000).map(i => ("hot", i.toDouble))
    val cold = (1 to 100).map(i => (s"k$i", i.toDouble))
    val df = (hot ++ cold).toDF("key", "value").repartition(8)

    val salted = Salting.saltedSumCount(df, "key", "value", saltBuckets = 8)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2)))
      .toMap
    val plain = df.groupBy("key")
      .agg(sum("value").as("s"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2)))
      .toMap
    assert(salted === plain)
    assert(salted("hot")._2 === 10000L)
  }
}
