package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BindReferences, Expression, GenericInternalRow,
  JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col

/** Native as-of join — the full custom-operator tier: a resolved
  * [[AsOfJoinNode]] logical plan, planned by [[AsOfJoinStrategy]] into
  * [[AsOfJoinExec]], a sort-merge physical operator, registered through
  * `SparkSessionExtensions.injectPlannerStrategy` (GraftExtensions) and
  * `experimental.extraStrategies` (ad-hoc sessions).
  *
  * Exists because "most recent right row at or before each left row, per
  * key" has no Spark built-in. The composable union+window form
  * (graft.ops.AsOfJoin) carries BOTH sides through one shuffle, sorts
  * the union, and runs a running-last-value window; this operator
  * shuffles each side on its own key, sorts each side separately
  * (EnsureRequirements inserts the exchanges/sorts from the declared
  * requirements — exactly how SortMergeJoin gets planned), and then does
  * a linear merge walk per co-located partition: no window state, no
  * union row inflation, and the right side streams with one retained row
  * per key. Cost profile: two hash shuffles of the *separate* sides vs
  * one shuffle of the *combined* sides — strictly less sort volume.
  *
  * Semantics: left rows always survive (left-outer); right payload is
  * null when no right row with equal key has ts ≤ left ts. Null keys
  * never match. Null ts sorts first and counts as "before everything".
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTs: Attribute,
    rightTs: Attribute)
  extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lts, rts) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTs: Attribute,
    rightTs: Attribute)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // same contract SortMergeJoin declares: co-clustered on the join keys,
  // each side sorted by (key, ts) — EnsureRequirements inserts the
  // exchanges and sorts (and under AQE plans the stages around them)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val outAttrs = output
    val lKeyB = BindReferences.bindReference(leftKey: Expression, leftOut)
    val lTsB = BindReferences.bindReference(leftTs: Expression, leftOut)
    val rKeyB = BindReferences.bindReference(rightKey: Expression, rightOut)
    val rTsB = BindReferences.bindReference(rightTs: Expression, rightOut)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val tsOrd = TypeUtils.getInterpretedOrdering(leftTs.dataType)
    val rightArity = rightOut.length

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightArity)
      val proj = UnsafeProjection.create(outAttrs, outAttrs)

      new Iterator[InternalRow] {
        // lookahead right row (copied: exec iterators reuse row objects)
        private var rHead: InternalRow =
          if (rIter.hasNext) rIter.next().copy() else null
        // latest right row whose (key, ts) is ≤ the current left cursor
        private var lastMatch: InternalRow = null
        private var lastMatchKey: Any = null

        private def advanceRight(): Unit =
          rHead = if (rIter.hasNext) rIter.next().copy() else null

        // null ts = "before everything" (consistent with nulls-first sort)
        private def tsLeq(rt: Any, lt: Any): Boolean =
          if (rt == null) true
          else if (lt == null) false
          else tsOrd.compare(rt, lt) <= 0

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = lKeyB.eval(l)
          val lt = lTsB.eval(l)
          if (lk != null) {
            var continue = rHead != null
            while (continue) {
              val rk = rKeyB.eval(rHead)
              if (rk == null) {
                advanceRight() // null right keys match nothing
              } else {
                val c = keyOrd.compare(rk, lk)
                if (c < 0) {
                  // left keys ascend: keys below lk are exhausted
                  advanceRight()
                } else if (c == 0 && tsLeq(rTsB.eval(rHead), lt)) {
                  lastMatch = rHead
                  lastMatchKey = rk
                  advanceRight()
                } else {
                  continue = false // rk > lk, or same key but later ts
                }
              }
              if (rHead == null) continue = false
            }
          }
          val matched = lk != null && lastMatch != null &&
            keyOrd.compare(lastMatchKey, lk) == 0
          proj(joined(l, if (matched) lastMatch else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-level API over the native operator. */
object AsOfJoinNative {

  /** Same contract as [[graft.ops.AsOfJoin.asOf]]: left columns
    * unchanged, right payload columns attached as `asof_<name>`
    * (null when no right row at or before).
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      rightCols: Seq[String]): DataFrame = {
    val spark = left.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    graft.functions.GraftFunctions.ensureRegistered(spark)
    // rename right columns so the combined output has unique names
    val rightSel = right.select(
      (Seq(col(key).as("__asof_k"), col(ts).as("__asof_t")) ++
        rightCols.map(c => col(c).as(s"asof_$c"))): _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = rightSel.queryExecution.analyzed
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found"))
    val node = AsOfJoinNode(lPlan, rPlan,
      attr(lPlan, key), attr(rPlan, "__asof_k"),
      attr(lPlan, ts), attr(rPlan, "__asof_t"))
    val joined = org.apache.spark.sql.graftshim.dataFrame(spark, node)
    joined.select(
      (left.columns.map(col) ++ rightCols.map(c => col(s"asof_$c"))).toSeq: _*)
  }
}
