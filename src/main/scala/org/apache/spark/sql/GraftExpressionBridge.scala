package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's private[sql] Column <-> Expression conversion (the
  * Spark 4 Column is a ColumnNode wrapper; `classic.ExpressionUtils` holds
  * the converters but is private[sql]). Used only by graft.functions to
  * expose custom Catalyst expressions as Columns.
  */
object GraftExpressionBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}

/** Bridge into the private[sql] plan-level constructors: build a DataFrame
  * from a hand-assembled LogicalPlan (custom operators) and register extra
  * planner strategies on a live session. */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def addStrategy(spark: SparkSession, strategy: execution.SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(strategy))
      exp.extraStrategies = exp.extraStrategies :+ strategy
  }

  def addOptimization(spark: SparkSession,
      rule: catalyst.rules.Rule[catalyst.plans.logical.LogicalPlan]): Unit = {
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    if (!exp.extraOptimizations.contains(rule))
      exp.extraOptimizations = exp.extraOptimizations :+ rule
  }

  /** The query's InternalRow RDD (`queryExecution.toRdd`) — the columnar
    * pipeline's own binary rows, with NO conversion to external objects.
    * Rows may be reused buffers: copy (or extract primitives) before
    * holding one past `next()`. */
  def internalRows(df: DataFrame): org.apache.spark.rdd.RDD[catalyst.InternalRow] =
    df.queryExecution.toRdd

  /** DataFrame over an InternalRow RDD (`internalCreateDataFrame`) — the
    * inverse seam, skipping the external-Row encoder entirely. */
  def ofInternalRows(spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[catalyst.InternalRow],
      schema: types.StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession].internalCreateDataFrame(rdd, schema)
}
