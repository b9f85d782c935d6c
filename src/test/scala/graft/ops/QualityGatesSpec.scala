package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QualityGatesSpec extends SparkSpec {

  test("clean frame: counters ride the action, no violations") {
    val ev = graft.queries.tbl(spark, sf(), "events")
    val (inst, obs) = QualityGates.instrument(ev, "clean",
      nullCols = Seq("user_id", "event_type"),
      rangeCols = Map("value" -> (-1e6, 1e6)))
    val n = inst.count() // the pipeline's own action — no extra scan
    assert(QualityGates.violations(obs) === Seq.empty)
    assert(obs.get("rows") === n)
  }

  test("poisoned frame: null and out-of-range rows are counted exactly") {
    val ev = graft.queries.tbl(spark, sf(), "events")
      .withColumn("user_id",
        when(col("event_id") % 100 === 0, lit(null)).otherwise(col("user_id")))
      .withColumn("value",
        when(col("event_id") % 200 === 0, lit(1e9)).otherwise(col("value")))
    val expectNulls = ev.filter(col("event_id") % 100 === 0).count()
    val expectOob = ev.filter(col("event_id") % 200 === 0).count()
    val (inst, obs) = QualityGates.instrument(ev, "poisoned",
      nullCols = Seq("user_id"),
      rangeCols = Map("value" -> (-1e6, 1e6)))
    inst.write.format("noop").mode("overwrite").save()
    assert(QualityGates.violations(obs) ===
      Seq(s"nulls_user_id=$expectNulls", s"oob_value=$expectOob").sorted)
  }
}
