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

  test("adversarial 2000-node chain converges in O(log d) rounds") {
    import spark.implicits._
    // a similarity chain of step-wise-drifting docs: diameter 2000.
    // Plain min-label propagation needs 2000 rounds (and with the default
    // budget would have returned PARTIAL labels); pointer jumping must
    // close it within the default maxIter=20 (~log2 diameter rounds).
    val edges = (1L until 2000L).map(i => (i, i + 1)).toDF("a", "b")
    val out = DedupClusters.connectedComponents(edges)
      .collect().map(r => r.getLong(1)).distinct
    assert(out === Array(1L))
  }

  test("non-convergence throws instead of returning partial labels") {
    import spark.implicits._
    val edges = (1L until 64L).map(i => (i, i + 1)).toDF("a", "b")
    intercept[IllegalStateException] {
      DedupClusters.connectedComponents(edges, maxIter = 2)
    }
  }
}
