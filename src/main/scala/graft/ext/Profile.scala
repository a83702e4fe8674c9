package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Table profiling: per-column statistics in long format — the `ANALYZE
  * TABLE`-style pass a lake engine runs before planning a large job (null
  * rates for quality gates, distinct counts for join-strategy and
  * dictionary decisions, min/max for partition-pruning sanity).
  *
  * Scale shape: ONE scan. All columns' aggregates run in a single `agg`
  * (Spark rewrites the multiple DISTINCT aggregates into one Expand +
  * aggregate pipeline — a constant number of shuffles regardless of column
  * count, vs one scan per column for the naive loop). The single result row
  * is then unpivoted driver-free with `stack`. Numeric min/max are
  * canonicalized through DECIMAL(27,6) so the stringified profile is
  * bit-stable across engines.
  */
object Profile {

  def profile(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty, "profile needs at least one column")
    val aggs = columns.flatMap { c =>
      val v = col(c)
      Seq(
        sum(when(v.isNull, 1L).otherwise(0L)).as(s"${c}__nn"),
        countDistinct(v).as(s"${c}__nd"),
        min(v).as(s"${c}__mn"),
        max(v).as(s"${c}__mx"))
    }
    val one = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    def asStr(c: String, suffix: String): String = df.schema(c).dataType match {
      case _: NumericType => s"CAST(CAST(${c}__$suffix AS DECIMAL(27,6)) AS STRING)"
      case _              => s"CAST(${c}__$suffix AS STRING)"
    }
    val stackArgs = columns.map { c =>
      s"'$c', ${c}__nn, ${c}__nd, ${asStr(c, "mn")}, ${asStr(c, "mx")}"
    }.mkString(", ")
    one.selectExpr("n_rows",
      s"stack(${columns.size}, $stackArgs) AS (column_name, n_null, n_distinct, min_value, max_value)")
      .select(col("column_name"), col("n_rows"), col("n_null"),
        col("n_distinct"), col("min_value"), col("max_value"))
  }
}
