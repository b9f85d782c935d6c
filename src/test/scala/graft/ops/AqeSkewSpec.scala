package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The OTHER half of the skew story next to `ops/Salting`: Spark's AQE
  * can re-plan a skewed sort-merge join at runtime by splitting oversized
  * partitions (OptimizeSkewedJoin). Salting is the write-side fix you
  * control; AQE skew-join is the runtime fix you get for free — this spec
  * proves the engine configuration actually delivers it, by building a
  * pathological key distribution and asserting the executed plan carries
  * the skew=true marker (thresholds are lowered to make local-scale data
  * register as skewed; on a real cluster the defaults fire at 256 MB).
  */
class AqeSkewSpec extends SparkSpec {

  test("AQE splits the hot partition of a skewed sort-merge join " +
    "(skew=true in the executed plan)") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.adaptive.forceOptimizeSkewedJoin",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> util.Try(conf.get(k)).toOption).toMap
    try {
      // the aggregate after the join re-shuffles on its own key anyway,
      // but AQE's conservative check counts that as "introducing an extra
      // shuffle" and skips the split without this
      conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ

      // pathological distribution: ~93% of rows collapse onto join key 0
      // (sf0.01 has 150 distinct users); `value` doubles keep the hot
      // shuffle partition above the lowered byte threshold (bare longs
      // compress to nothing)
      // AQE splits a skewed reduce partition at map-output granularity;
      // a single parquet file scans as ONE map task (nothing to split),
      // so spread the scan over several mappers first
      val ev = graft.queries.tbl(spark, sf("sf0.01"), "events")
        .select(col("event_id"), col("user_id"), col("value"),
          when(col("user_id") < 140, lit(0L)).otherwise(col("user_id"))
            .as("k"))
        .repartition(8)
      val dim = ev.select(col("k"), col("event_id").as("dim_id"))
        .filter(col("event_id") % 5000 === 0)
      val joined = ev.join(dim, "k")
        .groupBy("user_id")
        .agg(count(lit(1)).as("n"), sum(col("value")).as("sv"))
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        "AQE did not split the skewed partition:\n" + p.take(3000))
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
