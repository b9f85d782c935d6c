package graft.ops

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {

  test("attaches most recent right row at or before each left ts, per key") {
    import spark.implicits._
    val left = Seq(
      (1L, "u1", 100L), (2L, "u1", 250L), (3L, "u2", 50L), (4L, "u1", 300L)
    ).toDF("id", "key", "ts")
    val right = Seq(
      ("u1", 100L, "a"), ("u1", 260L, "b"), ("u2", 60L, "c")
    ).toDF("key", "ts", "tag")

    val out = AsOfJoin.asOf(left, right, "key", "ts", Seq("tag"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(3)))
    assert(out === Array(
      (1L, "a"), // equal ts is inclusive
      (2L, "a"), // 260 is after 250
      (3L, null), // no u2 row at/before 50
      (4L, "b")))
  }

  test("left columns survive untouched and nulls propagate") {
    import spark.implicits._
    val left = Seq((1L, "k", 5L, "keep")).toDF("id", "key", "ts", "note")
    val right = Seq(("other", 1L, 9.9)).toDF("key", "ts", "v")
    val row = AsOfJoin.asOf(left, right, "key", "ts", Seq("v")).head()
    assert(row.getString(3) === "keep")
    assert(row.isNullAt(4))
  }
}
