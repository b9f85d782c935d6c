package graft.functions

import org.apache.spark.sql.catalyst.expressions.{
  ArrayIntersect, ArrayUnion, Cast, Divide, Expression, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, StringType}

/** Optimizer rule: collapse the composable Jaccard pattern
  *
  *   `cast(size(array_intersect(a, b)) as double)
  *      / cast(size(array_union(a, b)) as double)`
  *
  * into the single-pass native [[JaccardSim]] — queries stay declarative
  * (and textually mirror the DuckDB oracle SQL), while the executed plan
  * gets the fused kernel: one hash-set pass instead of two array walks
  * plus two intermediate arrays per candidate pair. Registered both via
  * [[GraftExtensions]] (`injectOptimizerRule`) and
  * `experimental.extraOptimizations` (ad-hoc sessions).
  */
object RewriteJaccard extends Rule[LogicalPlan] {

  private def isStringArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Divide(
            Cast(Size(ArrayIntersect(a1, b1), _), DoubleType, _, _),
            Cast(Size(ArrayUnion(a2, b2), _), DoubleType, _, _), _)
          if a1.semanticEquals(a2) && b1.semanticEquals(b2) &&
            isStringArray(a1) && isStringArray(b1) =>
        JaccardSim(a1, b1)
    }
}
