package graft.plans

import org.apache.spark.sql.catalyst.expressions.AttributeSet
import org.apache.spark.sql.catalyst.plans.logical.{LocalLimit, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule restoring the pushdowns Catalyst's generic rules cannot
  * see through a custom node (ColumnPruning / LimitPushDown pattern-match
  * only the built-in operators):
  *
  *  - **Column pruning through the left side.** The as-of join passes every
  *    left column through untouched, so any column a parent projection
  *    doesn't need — beyond the join keys and the left time — can be pruned
  *    BELOW the node, where the V1 parquet planning collapses it into the
  *    scan's ReadSchema. At 100 TB this is the difference between shuffling
  *    a 3-column and a 30-column left side. (The right side needs no rule:
  *    the API already prunes it to keys+time+payload before the node.)
  *
  *  - **Limit pushdown into the left side.** The join emits exactly one row
  *    per left row, so a LocalLimit above it bounds the left input the same
  *    way LimitPushDown treats the streamed side of a left-outer join: keep
  *    the outer limit, insert a copy below on the left.
  *
  * Registered alongside the strategy: `injectOptimizerRule` at build time
  * (runs inside the operator-optimization batch), or
  * `experimental.extraOptimizations` on a live session (fixed-point user
  * batch) via [[AsOfMergeJoin.ensurePlanned]]. Both cases are guarded to a
  * single rewrite so the fixed point converges.
  */
object AsOfMergeJoinPushdown extends Rule[LogicalPlan] {

  /** Shared pruning body: keep only the left columns the parent projection
    * (plus the node's own keys/time) references, rebuilt via `withLeft`. */
  private def pruneLeft(p: Project, left: LogicalPlan,
      leftKeys: Seq[org.apache.spark.sql.catalyst.expressions.Attribute],
      leftTime: org.apache.spark.sql.catalyst.expressions.Attribute,
      withLeft: LogicalPlan => LogicalPlan): LogicalPlan = {
    val needed = p.references ++ AttributeSet(leftKeys :+ leftTime)
    val keptLeft = left.output.filter(needed.contains)
    if (keptLeft.size < left.output.size)
      p.copy(child = withLeft(Project(keptLeft, left)))
    else p
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(_, j: AsOfMergeJoinPlan) =>
      pruneLeft(p, j.left, j.leftKeys, j.leftTime, l => j.copy(left = l))

    // same passthrough argument for the range join's left side; its LIMIT
    // must NOT be pushed (a left row emits zero or many rows, so bounding
    // the input does not bound the output)
    case p @ Project(_, j: RangeMergeJoinPlan) =>
      pruneLeft(p, j.left, j.leftKeys, j.leftTime, l => j.copy(left = l))

    case ll @ LocalLimit(limitExpr, j: AsOfMergeJoinPlan) =>
      j.left match {
        case LocalLimit(e, _) if e.semanticEquals(limitExpr) => ll // already pushed
        case _ => ll.copy(child = j.copy(left = LocalLimit(limitExpr, j.left)))
      }
  }
}
