package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{JoinedRow, UnsafeProjection}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed global ranking — the scale-correct replacement for
  * `row_number().over(Window.orderBy(...))`, which Spark executes by
  * coalescing the ENTIRE dataset into one partition (it warns:
  * "No Partition Defined for Window operation"). At 100 TB that single
  * partition is a guaranteed OOM.
  *
  * Here the ordering stays distributed: a range-partitioned sort (what
  * `orderBy` already plans), one pass to count rows per partition, a
  * driver-side prefix sum over those counts (an array of numPartitions
  * longs — model-state sized, not data), and a per-partition sweep that
  * assigns `offset + local index`. The sorted frame is cached so the
  * sort runs once for both passes. Same mechanics as `zipWithIndex`,
  * kept on InternalRows.
  */
object GlobalRank {

  /** Append a 1-based global `rowNumCol` in the total order of
    * `sortCols`. Caller may `unpersist()` the input afterwards; the
    * intermediate sorted frame is cached and freed here.
    */
  def withRowNumber(
      df: DataFrame,
      sortCols: Seq[Column],
      rowNumCol: String = "rn"): DataFrame = {
    val spark = df.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val sorted = df.orderBy(sortCols: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sortedRdd = sorted.queryExecution.toRdd
    val counts = sortedRdd
      .mapPartitionsWithIndex { case (i, it) =>
        var n = 0L; while (it.hasNext) { it.next(); n += 1 }
        Iterator((i, n))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _)
    val schema = sorted.schema.add(rowNumCol, LongType, nullable = false)
    val attrs = org.apache.spark.sql.catalyst.types.DataTypeUtils
      .toAttributes(schema)
    val withRn = sortedRdd.mapPartitionsWithIndex { case (i, it) =>
      val proj = UnsafeProjection.create(schema)
      val joined = new JoinedRow
      val rnRow = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(1)
      var rn = offsets(i)
      it.map { row =>
        rn += 1
        rnRow.update(0, rn)
        proj(joined(row, rnRow)): InternalRow
      }
    }
    org.apache.spark.sql.graftshim.internalDataFrame(spark, withRn, attrs)
  }

  /** Global running total (inclusive prefix sum) of a LongType column in
    * the total order of `sortCols` — the distributed replacement for
    * `SUM(x) OVER (ORDER BY ...)`, which Spark would execute in ONE
    * partition. Same two-pass mechanics as [[withRowNumber]]: a
    * range-partitioned sort, per-partition value sums, a driver-side
    * prefix over numPartitions longs, and a per-partition sweep. The
    * canonical use is budgeted selection: order by priority, keep rows
    * while the running total stays under a global budget.
    */
  def withRunningTotal(
      df: DataFrame,
      sortCols: Seq[Column],
      valueCol: String,
      totalCol: String = "running_total"): DataFrame = {
    val spark = df.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val valueIdx = df.schema.fieldIndex(valueCol)
    require(df.schema(valueIdx).dataType == LongType,
      s"$valueCol must be LongType")
    val sorted = df.orderBy(sortCols: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sortedRdd = sorted.queryExecution.toRdd
    val partSums = sortedRdd
      .mapPartitionsWithIndex { case (i, it) =>
        var s = 0L
        while (it.hasNext) s += it.next().getLong(valueIdx)
        Iterator((i, s))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _)
    val schema = sorted.schema.add(totalCol, LongType, nullable = false)
    val attrs = org.apache.spark.sql.catalyst.types.DataTypeUtils
      .toAttributes(schema)
    val swept = sortedRdd.mapPartitionsWithIndex { case (i, it) =>
      val proj = UnsafeProjection.create(schema)
      val joined = new JoinedRow
      val totRow = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(1)
      var running = offsets(i)
      it.map { row =>
        running += row.getLong(valueIdx)
        totRow.update(0, running)
        proj(joined(row, totRow)): InternalRow
      }
    }
    org.apache.spark.sql.graftshim.internalDataFrame(spark, swept, attrs)
  }

  /** NTILE(n) over the global order of `sortCols`, without a single-
    * partition window. SQL NTILE semantics: with q = cnt div n and
    * r = cnt mod n, the first r tiles hold q+1 rows and the rest hold q
    * — NOT the proportional `floor((rn-1)*n/cnt)` rule, which drifts by
    * one at tile boundaries whenever cnt is not divisible by n (a
    * divisibility coincidence can mask this: 1500 % 4 == 0 passes both
    * ways, 150 % 4 == 2 does not — spec-pinned).
    */
  def ntile(
      df: DataFrame,
      sortCols: Seq[Column],
      n: Int,
      tileCol: String = "tile"): DataFrame = {
    val ranked = withRowNumber(df, sortCols, "__rn")
    val cnt = ranked.count()
    val q = cnt / n
    val r = cnt % n
    val cut = r * (q + 1) // rows covered by the (q+1)-sized tiles
    ranked
      .withColumn(tileCol, expr(
        s"""CASE WHEN __rn <= ${cut}L
              THEN (__rn - 1) div ${q + 1}L + 1L
              ELSE ${r}L + (__rn - ${cut}L - 1) div ${q}L + 1L END"""))
      .drop("__rn")
  }
}
