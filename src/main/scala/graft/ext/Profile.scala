package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Table profiling: per-column statistics in long format — the `ANALYZE
  * TABLE`-style pass a lake engine runs before planning a large job (null
  * rates for quality gates, distinct counts for join-strategy and
  * dictionary decisions, min/max for partition-pruning sanity).
  *
  * Scale shape: one COLUMN-PRUNED scan per column, each a two-level
  * aggregation — groupBy(value) first (map-side partials collapse
  * duplicates before the shuffle, so the exchange carries distinct values,
  * not rows), then a single-group rollup of the value histogram. On a
  * columnar store N pruned scans read exactly the N columns once in total.
  * The tempting alternative — every column's exact COUNT(DISTINCT) in ONE
  * aggregate — plans as an Expand that multiplies every row by N+1 before
  * shuffling; measured at sf0.1 it was 6.9 s vs ~1 s for this shape, and
  * the gap widens with row count. Numeric min/max are canonicalized
  * through DECIMAL(27,6) so the stringified profile is bit-stable across
  * engines.
  */
object Profile {

  def profile(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty, "profile needs at least one column")
    columns.map { c =>
      val isNumeric = df.schema(c).dataType match {
        case _: NumericType => true
        case _              => false
      }
      def asStr(v: org.apache.spark.sql.Column) =
        if (isNumeric) v.cast("decimal(27,6)").cast("string") else v.cast("string")
      df.select(col(c).as("val"))
        .groupBy("val").agg(count(lit(1)).as("cnt"))
        .agg(
          sum(col("cnt")).as("n_rows"),
          coalesce(sum(when(col("val").isNull, col("cnt"))), lit(0L)).as("n_null"),
          count(when(col("val").isNotNull, lit(1))).as("n_distinct"),
          min(col("val")).as("mn"), max(col("val")).as("mx"))
        .select(lit(c).as("column_name"), col("n_rows"), col("n_null"),
          col("n_distinct"), asStr(col("mn")).as("min_value"), asStr(col("mx")).as("max_value"))
    }.reduce(_ unionByName _)
  }
}
