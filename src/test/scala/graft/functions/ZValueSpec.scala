package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Morton-code expression: known interleavings, null/range guards, and
  * locality (z-adjacent codes differ in low bits for low-dim deltas).
  */
class ZValueSpec extends SparkSpec {
  import spark.implicits._

  private def z(a: Int, b: Int): Long = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    Seq((a, b)).toDF("a", "b")
      .select(call_function("z_value", array(col("a"), col("b"))).as("z"))
      .head().getLong(0)
  }

  test("known 2-d interleavings") {
    assert(z(0, 0) === 0L)
    // bit 0 of dim0 is the SECOND-lowest output bit (dim order round-robin
    // from the high bit: dim0 before dim1 at each level)
    assert(z(1, 0) === 2L)
    assert(z(0, 1) === 1L)
    assert(z(1, 1) === 3L)
    assert(z(2, 2) === 12L)
    assert(z(0xffff, 0xffff) === 0xffffffffL)
  }

  test("locality: a +1 step in one dim changes only low bits when the " +
    "other dim is fixed at small values") {
    assert((z(2, 3) ^ z(3, 3)) < 16,
      "adjacent cells should share high bits")
  }

  test("nulls and out-of-range ranks yield null, not garbage") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val rows = Seq((Some(1), Some(2)), (None, Some(2)), (Some(70000), Some(1)))
      .toDF("a", "b")
      .select(call_function("z_value", array(col("a"), col("b"))).as("z"))
      .collect()
    assert(!rows(0).isNullAt(0))
    assert(rows(1).isNullAt(0))
    assert(rows(2).isNullAt(0))
  }

  test("3-d interleave round-robins all dims") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val v = Seq((1, 0, 0)).toDF("a", "b", "c")
      .select(call_function("z_value",
        array(col("a"), col("b"), col("c"))).as("z"))
      .head().getLong(0)
    assert(v === 4L) // bit 0 of dim0 sits above dim1's and dim2's bit 0
  }
}
