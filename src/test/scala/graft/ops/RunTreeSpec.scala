package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RunTreeSpec extends SparkSpec {
  import spark.implicits._

  private def nodes(rows: (String, String)*) =
    rows.toDF("run_id", "parent_run_id")

  test("resolve: multi-level tree gets exact roots, depths, paths") {
    //        a                x
    //       / \               |
    //      b   c              y
    //     / \
    //    d   e
    //        |
    //        f
    val got = RunTree.resolve(
      nodes("a" -> "", "b" -> "a", "c" -> "a", "d" -> "b", "e" -> "b",
        "f" -> "e", "x" -> "", "y" -> "x"),
      "run_id", "parent_run_id")
      .orderBy("run_id")
      .as[(String, String, Long, String)].collect().toSeq
    assert(got === Seq(
      ("a", "a", 0L, "a"),
      ("b", "a", 1L, "a/b"),
      ("c", "a", 1L, "a/c"),
      ("d", "a", 2L, "a/b/d"),
      ("e", "a", 2L, "a/b/e"),
      ("f", "a", 3L, "a/b/e/f"),
      ("x", "x", 0L, "x"),
      ("y", "x", 1L, "x/y")))
  }

  test("resolve: null parent is a root like empty string") {
    val in = Seq(("a", Option.empty[String]), ("b", Some("a")))
      .toDF("run_id", "parent_run_id")
    val got = RunTree.resolve(in, "run_id", "parent_run_id")
      .orderBy("run_id")
      .as[(String, String, Long, String)].collect().toSeq
    assert(got === Seq(("a", "a", 0L, "a"), ("b", "a", 1L, "a/b")))
  }

  test("resolve: deep chain needs only log2 rounds (chain of 20)") {
    val chain = ("n0" -> "") +:
      (1 until 20).map(i => s"n$i" -> s"n${i - 1}")
    val got = RunTree.resolve(nodes(chain: _*), "run_id", "parent_run_id")
    assert(got.filter(col("depth") === 19).select("run_id")
      .as[String].collect().toSeq === Seq("n19"))
    assert(got.filter(col("run_id") === "n19").select("path")
      .as[String].head() ===
      (0 until 20).map(i => s"n$i").mkString("/"))
  }

  test("resolve: dangling parent roots the orphan chain at the missing id") {
    // "gone" exists only as a pointer — retention dropped the root
    val got = RunTree.resolve(
      nodes("b" -> "gone", "c" -> "b"), "run_id", "parent_run_id")
      .orderBy("run_id")
      .as[(String, String, Long, String)].collect().toSeq
    assert(got === Seq(
      ("b", "gone", 1L, "gone/b"),
      ("c", "gone", 2L, "gone/b/c")))
  }

  test("resolve: cycle fails loudly instead of spinning") {
    val e = intercept[IllegalStateException] {
      RunTree.resolve(nodes("a" -> "b", "b" -> "a"),
        "run_id", "parent_run_id", maxIters = 5).collect()
    }
    assert(e.getMessage.contains("cycle"))
  }

  test("resolve: empty input resolves to an empty frame with the contract schema") {
    val got = RunTree.resolve(
      nodes().limit(0), "run_id", "parent_run_id")
    assert(got.columns.toSeq === Seq("run_id", "root_id", "depth", "path"))
    assert(got.isEmpty)
  }

  test("rollup: per-root size, max depth, and leaf count") {
    val got = RunTree.rollup(
      nodes("a" -> "", "b" -> "a", "c" -> "a", "d" -> "b", "e" -> "b",
        "f" -> "e", "x" -> "", "y" -> "x"),
      "run_id", "parent_run_id")
      .orderBy("root_id")
      .as[(String, Long, Long, Long)].collect().toSeq
    // a-tree: 6 runs, depth 3, leaves {c, d, f}; x-tree: 2 runs, depth 1,
    // leaves {y}
    assert(got === Seq(("a", 6L, 3L, 3L), ("x", 2L, 1L, 1L)))
  }

  test("matches LogTable.subtree BFS on the same trace") {
    val n = nodes("a" -> "", "b" -> "a", "c" -> "b", "d" -> "c",
      "z" -> "", "w" -> "z")
    val resolved = RunTree.resolve(n, "run_id", "parent_run_id")
    val viaResolve = resolved.filter(col("root_id") === "a")
      .select("run_id").as[String].collect().toSet
    val log = n.select(
      lit(new java.sql.Timestamp(0L)).as("timestamp"), col("run_id"),
      col("parent_run_id"), lit("").as("custom_id"),
      lit("llm_end").as("event_type"), lit("{}").as("logger_metadata"),
      lit("{}").as("payload"))
    val viaBfs = graft.query.LogTable(log).subtree("a")
      .select("run_id").as[String].collect().toSet
    assert(viaResolve === Set("a", "b", "c", "d"))
    assert(viaBfs === viaResolve)
    // LogTable.runTrees surfaces the same resolution over the log frame
    val viaLogTable = graft.query.LogTable(log).runTrees
      .filter(col("root_id") === "a")
      .select("run_id").as[String].collect().toSet
    assert(viaLogTable === viaResolve)
  }
}
