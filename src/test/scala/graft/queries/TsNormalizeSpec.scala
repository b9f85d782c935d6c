package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** The testdata contract: `events.ts` has shipped as a ns-epoch long
  * (TIMESTAMP(NANOS) parquet under the legacy flag) and as a µs timestamp
  * (the round-5 driver regeneration, read as TIMESTAMP_NTZ). `tbl`/
  * `normalizeTs` must accept every shape and converge on the engine's
  * internal ns-long form, so `tsMicros` and ns-epoch literals stay
  * type-stable regardless of which generation of testdata is on disk.
  */
class TsNormalizeSpec extends SparkSpec {

  // one deterministic instant: 2024-01-15T06:30:00.123456Z
  private val usEpoch = 1705300200123456L
  private val nsEpoch = usEpoch * 1000L

  private def writeFixture(dt: DataType): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_ts_fixture").toString
    val base = Seq((1L, usEpoch), (2L, usEpoch + 60L * 1000000))
      .toDF("event_id", "us")
    val withTs = dt match {
      case LongType => base.withColumn("ts", col("us") * 1000L)
      case TimestampType =>
        base.withColumn("ts", timestamp_micros(col("us")))
      case TimestampNTZType =>
        base.withColumn("ts",
          timestamp_micros(col("us")).cast(TimestampNTZType))
      case other => fail(s"unhandled fixture type $other")
    }
    withTs.drop("us").write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    dir
  }

  for (dt <- Seq[DataType](LongType, TimestampType, TimestampNTZType)) {
    test(s"tbl normalizes ts stored as ${dt.sql} to the ns-long contract") {
      val dir = writeFixture(dt)
      val df = tbl(spark, dir, "events")
      assert(df.schema("ts").dataType === LongType)
      val rows = df.orderBy("event_id")
        .select(col("ts"), tsMicros.as("us")).collect()
      assert(rows(0).getLong(0) === nsEpoch)
      assert(rows(0).getLong(1) === usEpoch)
      assert(rows(1).getLong(1) === usEpoch + 60L * 1000000)
    }
  }

  test("ns-epoch literal comparisons hold on every stored shape") {
    // the q_union_partitions cutoff idiom: col("ts") < lit(<ns epoch>)
    val cutoffNs = nsEpoch + 1
    for (dt <- Seq[DataType](LongType, TimestampType, TimestampNTZType)) {
      val df = tbl(spark, writeFixture(dt), "events")
      assert(df.filter(col("ts") < lit(cutoffNs)).count() === 1L, dt.sql)
    }
  }

  test("the real testdata passes the schema contract") {
    assert(graft.tools.SchemaContract.check(spark, sf()) === Seq.empty)
  }

  test("the schema contract flags a drifted shape loudly") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_drift").toString
    // string ts = a shape the engine does NOT accept
    Seq((1L, "2024-01-15")).toDF("event_id", "ts")
      .write.parquet(s"$dir/events.parquet")
    val v = graft.tools.SchemaContract.check(spark, dir)
    assert(v.exists(_.contains("`ts`")), v.mkString("; "))
  }
}
