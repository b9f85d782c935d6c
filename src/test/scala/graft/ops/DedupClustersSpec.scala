package graft.ops

import graft.SparkSpec

class DedupClustersSpec extends SparkSpec {

  test("components collapse to min-id keepers, including chains") {
    import spark.implicits._
    // components: {1,2,3} via chain 1-2, 2-3; {10,11}; {20,21,22} via star
    val edges = Seq((2L, 1L), (2L, 3L), (10L, 11L), (20L, 21L), (20L, 22L))
      .toDF("a", "b")
    val out = DedupClusters.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("long path converges within diameter iterations") {
    import spark.implicits._
    val edges = (1L until 8L).map(i => (i, i + 1)).toDF("a", "b")
    val out = DedupClusters.connectedComponents(edges)
      .collect().map(r => r.getLong(1)).distinct
    assert(out === Array(1L))
  }
}
