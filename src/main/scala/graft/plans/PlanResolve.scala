package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.functions.col

/** Shared attribute plumbing for the DataFrame entry points of the custom
  * plan nodes (as-of merge, range merge). */
private[plans] object PlanResolve {

  /** Re-alias every referenced column so each side gets fresh ExprIds — a
    * self-join (both sides derived from one scan) must not alias the two
    * sides' attributes to each other. Returns the ANALYZED plan. */
  def freshened(df: DataFrame, cols: Seq[String]): LogicalPlan =
    df.select(cols.map(c => col(c).as(c)): _*).queryExecution.analyzed

  /** Resolve a column by name: exact match first, then the DataFrame API's
    * default case-insensitive fallback (unique match required). */
  def attr(plan: LogicalPlan, name: String): Attribute =
    plan.output.find(_.name == name).getOrElse {
      plan.output.filter(_.name.equalsIgnoreCase(name)) match {
        case Seq(a) => a
        case Seq() => throw new IllegalArgumentException(
          s"column $name not in ${plan.output.map(_.name).mkString(", ")}")
        case many => throw new IllegalArgumentException(
          s"column $name is ambiguous among ${many.map(_.name).mkString(", ")}")
      }
    }
}
