package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared helpers for the oracle-checked query registry.
  *
  * Cross-engine determinism rules (Spark result must hash-match DuckDB):
  *   - Sums of doubles are order-dependent; cast operands to exact decimals
  *     first, round the exact decimal sum, then cast to double. Both engines
  *     then produce bit-identical values.
  *   - Never emit raw timestamps (testdata `ts` is ns; Spark truncates to µs
  *     while DuckDB keeps ns). Emit `unix_micros`/`epoch_us` bigints or
  *     formatted strings instead, and order by those.
  *   - Every query ends in a total ORDER BY over a unique key set.
  */
package object queries {

  /** One registry entry: the Spark implementation plus (optionally) the
    * equivalent DuckDB oracle SQL. `None` oracle → driver records a
    * rows-only check.
    */
  final case class Q(
      name: String,
      spark: (SparkSession, String) => DataFrame,
      oracle: Option[String],
      bench: Boolean = false)

  def tbl(s: SparkSession, dir: String, name: String): DataFrame = {
    // testdata `events.ts` is TIMESTAMP(NANOS), which Spark rejects by
    // default; read it as a ns-epoch long and derive µs/timestamps
    // explicitly (DuckDB oracle side uses epoch_us for the same floor).
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.functions.GraftFunctions.ensureRegistered(s)
    s.read.parquet(s"$dir/$name.parquet")
  }

  /** events.ts (ns-epoch long) → µs-epoch long, matching DuckDB epoch_us. */
  def tsMicros: Column = expr("ts div 1000")

  /** Exact money-ish operand: double → DECIMAL(14,4). */
  def decPrice(c: Column): Column = c.cast(DecimalType(14, 4))

  /** Exact rate operand in [0,1]: double → DECIMAL(7,4). */
  def decRate(c: Column): Column = c.cast(DecimalType(7, 4))

  /** (1 - rate) as exact DECIMAL(8,4). */
  def oneMinus(c: Column): Column = (lit(1) - decRate(c)).cast(DecimalType(8, 4))

  /** (1 + rate) as exact DECIMAL(8,4). */
  def onePlus(c: Column): Column = (lit(1) + decRate(c)).cast(DecimalType(8, 4))

  /** Exact decimal sum → rounded → double (deterministic across engines). */
  def sumRound(c: Column, scale: Int = 2): Column =
    round(sum(c), scale).cast("double")

  /** count(*) as bigint under a stable name. */
  def cnt(name: String = "n"): Column = count(lit(1)).as(name)

  // DuckDB-side fragments mirroring the Scala helpers above.
  /** SUM over exact decimal, rounded, as DOUBLE. */
  def sqlSumRound(inner: String, scale: Int = 2): String =
    s"CAST(ROUND(SUM($inner), $scale) AS DOUBLE)"
  def sqlPrice(col: String): String = s"CAST($col AS DECIMAL(14,4))"
  def sqlOneMinus(col: String): String =
    s"CAST(1 - CAST($col AS DECIMAL(7,4)) AS DECIMAL(8,4))"
  def sqlOnePlus(col: String): String =
    s"CAST(1 + CAST($col AS DECIMAL(7,4)) AS DECIMAL(8,4))"
}
