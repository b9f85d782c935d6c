package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Whole-table run-tree resolution over (id, parent) rows — the log
  * table's `run_id`/`parent_run_id` hierarchy (reference AGENTS.md:237-258
  * run trees; 3-level chain→llm→tool hierarchy in
  * tests/test_enhanced_logging.py:322-388) resolved for EVERY node at
  * once: root id, depth, and the full root→node path.
  *
  * Complements [[graft.query.LogTable.subtree]] (per-trace BFS from one
  * run): debugging one trace wants BFS; analytics over ALL traces ("group
  * by root", "depth histogram", "cost per agent tree") wants every node's
  * root/depth in one pass. Pointer jumping gets there in ⌈log₂ depth⌉
  * self-join rounds instead of depth rounds — each round every unresolved
  * node's ancestor pointer jumps to its ancestor's pointer, doubling the
  * climbed distance (same machinery as the connected-components loop in
  * [[DedupClusters]], here preserving depth and path order, which
  * components discard).
  *
  * Scale shape: each round is one equi-join of the node set against
  * itself on the current pointer (shuffle on a single key column, AQE
  * skew-splittable — a hot root is the common skew) followed by a
  * `localCheckpoint` that truncates the otherwise exponentially deepening
  * lineage. State per node is O(path length) for the `path` column only;
  * root/depth stay constant-width. For a log with max trace depth 64 the
  * loop runs 6 rounds regardless of row count.
  */
object RunTree {

  /** Resolve every node to (idCol, root_id, depth, path).
    *
    * `nodes` must have one row per node: a unique `idCol` and a
    * `parentCol` that is null or empty-string for roots (the log
    * envelope's "no parent" is `""`, LogSchema.scala). `depth` is edges
    * from the root (root = 0); `path` is the `sep`-joined ids from root
    * to node inclusive (ids must not contain `sep`).
    *
    * A parent id that matches no node (dangling pointer — a trace whose
    * root fell outside retention) terminates its chain visibly: the
    * missing id becomes the chain's root_id and leads its paths, so
    * orphaned subtrees group together instead of crashing the job or
    * silently vanishing (what a recursive CTE anchored at roots does).
    * A cycle (corrupt parent pointers) can never resolve, so the loop
    * throws after `maxIters` rounds rather than spin — at the default 40
    * rounds any acyclic chain up to 2^40 edges deep has resolved.
    */
  def resolve(
      nodes: DataFrame,
      idCol: String,
      parentCol: String,
      maxIters: Int = 40,
      sep: String = "/"): DataFrame =
    resolveImpl(nodes, idCol, parentCol, maxIters, sep, withPath = true)

  /** [[resolve]] without the `path` column — for callers that only need
    * root/depth ([[rollup]]). The path strings are by far the widest
    * state the loop carries (they grow toward full root→node id lists
    * while root/depth stay constant-width), so a rollup that shuffles
    * and checkpoints them through every pointer-jump round pays most of
    * its bytes for a column it immediately discards.
    */
  def resolveNoPath(
      nodes: DataFrame,
      idCol: String,
      parentCol: String,
      maxIters: Int = 40): DataFrame =
    resolveImpl(nodes, idCol, parentCol, maxIters, "/", withPath = false)

  private def resolveImpl(
      nodes: DataFrame,
      idCol: String,
      parentCol: String,
      maxIters: Int,
      sep: String,
      withPath: Boolean): DataFrame = {
    val isRoot = col(parentCol).isNull || col(parentCol) === ""
    val initCols = Seq(
      col(idCol).cast("string").as("_id"),
      when(isRoot, lit(null).cast("string"))
        .otherwise(col(parentCol).cast("string")).as("_anc"),
      when(isRoot, lit(0L)).otherwise(lit(1L)).as("_depth"),
      when(isRoot, col(idCol).cast("string"))
        .otherwise(lit(null).cast("string")).as("_root")) ++
      (if (withPath) Seq(col(idCol).cast("string").as("_path")) else Nil)
    // The unresolved count rides each checkpoint's own job as an
    // observed metric, so the loop needs no separate probe action: the
    // old `filter(_anc).isEmpty` per round cost one extra full pass over
    // the node set (⌈log₂ depth⌉ + 1 extra jobs per resolve).
    var obsSeq = 0
    def checkpointCounted(df: DataFrame): (DataFrame, Long) = {
      obsSeq += 1
      val obs = org.apache.spark.sql.Observation(s"_rt_pending_$obsSeq")
      val out = df.observe(obs,
        sum(when(col("_anc").isNotNull, 1L).otherwise(0L)).as("p"))
        .localCheckpoint()
      val pending = obs.get.get("p").collect {
        case n: java.lang.Long => n.longValue }.getOrElse(0L)
      (out, pending)
    }
    var (cur, pending) = checkpointCounted(nodes.select(initCols: _*))

    // Invariants kept by every round: _depth = edges from _anc to _id;
    // _path = ids from (just below _anc) to _id; _anc null ⇒ resolved,
    // with _root set and _path the full root→node path.
    //
    // Resolved rows leave the loop frame: they can never change again,
    // so re-shuffling them through every remaining round's join is pure
    // waste (at scale most nodes resolve in the early rounds — every
    // node within 2^r edges of its root is settled after round r). They
    // must stay VISIBLE as jump targets — an unresolved node's pointer
    // may land on a resolved node — so the join's build side is the full
    // mapping (settled ∪ pending) while the probe side shrinks to the
    // pending rows only.
    var settled = List.empty[DataFrame]
    var iters = 0
    while (pending > 0) {
      iters += 1
      if (iters > maxIters)
        throw new IllegalStateException(
          s"RunTree.resolve: unresolved chains after $maxIters rounds — " +
            "cycle in parent pointers?")
      val todo = cur.filter(col("_anc").isNotNull)
      settled ::= cur.filter(col("_anc").isNull)
      val ancCols = Seq(
        col("_id").as("_aid"), col("_anc").as("_aanc"),
        col("_depth").as("_adepth"), col("_root").as("_aroot")) ++
        (if (withPath) Seq(col("_path").as("_apath")) else Nil)
      val anc = (settled :+ todo).reduce(_.unionByName(_))
        .select(ancCols: _*)
      // every probe row has _anc non-null, so the old resolved-row
      // passthrough branches (`when(_anc.isNull, …)`) reduce away
      val jumpCols = Seq(
        col("_id"),
        when(col("_aid").isNull, lit(null).cast("string"))
          .otherwise(col("_aanc")).as("_anc2"),
        when(col("_aid").isNull, col("_depth"))
          .otherwise(col("_depth") + col("_adepth")).as("_depth2"),
        when(col("_aid").isNull, col("_anc")) // dangling parent
          .otherwise(col("_aroot")).as("_root2")) ++
        (if (withPath) Seq(
          when(col("_aid").isNull,
            concat_ws(sep, col("_anc"), col("_path")))
            .otherwise(concat_ws(sep, col("_apath"), col("_path")))
            .as("_path2")) else Nil)
      val next = todo.join(anc, todo("_anc") === anc("_aid"), "left")
        .select(jumpCols: _*)
        .withColumnsRenamed(Map("_anc2" -> "_anc", "_depth2" -> "_depth",
          "_root2" -> "_root", "_path2" -> "_path"))
      val cp = checkpointCounted(next)
      cur = cp._1
      pending = cp._2
    }
    val outCols = Seq(col("_id").as(idCol), col("_root").as("root_id"),
      col("_depth").as("depth")) ++
      (if (withPath) Seq(col("_path").as("path")) else Nil)
    (settled :+ cur).reduce(_.unionByName(_)).select(outCols: _*)
  }

  /** Per-root rollup of a resolved tree: tree size, max depth, and leaf
    * count (nodes no other node points at). One aggregate over the
    * resolved frame joined with the distinct-parent set — output is one
    * row per trace, the frame a trace-level dashboard reads.
    */
  def rollup(
      nodes: DataFrame,
      idCol: String,
      parentCol: String): DataFrame = {
    val resolved = resolveNoPath(nodes, idCol, parentCol)
    val parents = nodes
      .filter(col(parentCol).isNotNull && col(parentCol) =!= "")
      .select(col(parentCol).cast("string").as(idCol)).distinct()
      .withColumn("_is_parent", lit(true))
    resolved.join(parents, Seq(idCol), "left")
      .groupBy(col("root_id"))
      .agg(
        count(lit(1)).cast("long").as("n_runs"),
        max("depth").as("max_depth"),
        sum(when(col("_is_parent").isNull, 1L).otherwise(0L))
          .as("n_leaves"))
  }
}
