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

  /** k-anonymity generalization ladder: for each candidate bucket width over
    * the numeric quasi-identifier, the equivalence-class census under
    * (categorical QIs, floor(value/width)) — how many classes exist, how many
    * fall below k, and how many ROWS sit in those re-identifiable classes.
    * This is the audit a training-data release runs before publishing
    * user-derived records: the smallest width whose risky_rows hits zero is
    * the minimal generalization that k-anonymizes the cut.
    *
    * Shape: widths are a literal ladder, exploded per row (|widths| ~ 3-5,
    * a constant fan-out, NOT a join), then ONE hash aggregation keyed by
    * (width, QIs, bucket) with map-side partials, then a |classes|-sized
    * rollup per width — two shuffles total regardless of ladder length, and
    * the second input is the class census, not rows. Buckets are computed on
    * exact integer cents so floor() sees the same IEEE quotient in any
    * engine; counts are exact integers — bitwise. */
  def kAnonymityLadder(rows: DataFrame, qiCols: Seq[String], valueCol: String,
      widths: Seq[Int], k: Int): DataFrame = {
    require(widths.nonEmpty && widths.forall(_ > 0), "widths must be positive")
    require(k >= 2, "k < 2 makes every class safe by definition")
    val cents = round(col(valueCol) * 100).cast("long")
    val classes = rows
      .withColumn("width", explode(array(widths.map(lit(_)): _*)))
      .withColumn("bucket", floor(cents / (col("width") * lit(100.0))).cast("long"))
      .groupBy((col("width") +: qiCols.map(col)) :+ col("bucket"): _*)
      .agg(count(lit(1)).as("class_size"))
    classes.groupBy("width")
      .agg(
        count(lit(1)).as("classes"),
        coalesce(sum(when(col("class_size") < k, 1L)), lit(0L)).as("risky_classes"),
        coalesce(sum(when(col("class_size") < k, col("class_size"))), lit(0L))
          .as("risky_rows"))
      .withColumn("meets_k", when(col("risky_classes") === 0, 1).otherwise(0))
  }
}
