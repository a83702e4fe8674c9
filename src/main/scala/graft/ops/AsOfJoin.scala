package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: attach to each left row the payload of the LATEST right row
  * with the same keys whose time is before (strict) or at-or-before
  * (non-strict) the left row's time — the standard event-attribution /
  * point-in-time-lookup operator (e.g. each trade joined to the prevailing
  * quote) that Spark has no built-in for.
  *
  * Implementation is the scalable union-and-scan formulation, not a range
  * join: both sides are unioned on (keys, time, side) and a single keyed
  * window carries the last non-null right payload forward
  * (`last(_, ignoreNulls)` over ROWS UNBOUNDED PRECEDING). Cost is ONE
  * shuffle on the join keys and a linear per-key scan — no range-condition
  * join (which Spark plans as a broadcast/cartesian with per-row filtering),
  * no per-left-row probe, and no state proportional to the time span. At
  * 100 TB this is the same shuffle a plain equi-join on the keys would pay.
  *
  * Determinism: rows are totally ordered by (time, side, tieBreak). At equal
  * times the side marker decides eligibility (strict: left sorts FIRST so an
  * equal-time right row is ignored; non-strict: right sorts first so it is
  * taken), and `tieBreak` (payload column names, e.g. an event id) breaks
  * ties among right rows at the same instant — the LARGEST tieBreak value
  * wins, mirroring ORDER BY ... ASC + last().
  *
  * Left rows with no eligible right row keep null payload columns (left
  * outer semantics). Right rows with a null time are dropped. Payload column
  * names must not collide with left column names (alias on the right side
  * first).
  */
object AsOfJoin {

  def asOfLeft(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, payload: Seq[String],
      strict: Boolean = true, tieBreak: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one equality key")
    require(payload.nonEmpty, "as-of join needs at least one payload column")
    require(tieBreak.forall(payload.contains),
      "tieBreak columns must be part of the right-side payload")
    // Eligibility at equal time is encoded in the sort order of the side
    // marker: the right row must sort before the left row iff it is eligible.
    val (leftSide, rightSide) = if (strict) (0, 1) else (1, 0)
    val payloadType = org.apache.spark.sql.types.StructType(
      right.select(payload.map(col): _*).schema.fields)

    val l = left.select(
      keys.map(col) ++ Seq(
        col(leftTime).as("_t"),
        lit(leftSide).as("_side"),
        struct(left.columns.map(col): _*).as("_row"),
        lit(null).cast(payloadType).as("_p")): _*)
    val r = right.filter(col(rightTime).isNotNull).select(
      keys.map(col) ++ Seq(
        col(rightTime).as("_t"),
        lit(rightSide).as("_side"),
        lit(null).cast(l.schema("_row").dataType).as("_row"),
        struct(payload.map(col): _*).as("_p")): _*)

    val order = Seq(col("_t"), col("_side")) ++
      tieBreak.map(t => col("_p").getField(t))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .withColumn("_m", last(col("_p"), ignoreNulls = true).over(w))
      .filter(col("_side") === leftSide)
      .select(
        left.columns.map(c => col("_row").getField(c).as(c)) ++
          payload.map(p => col("_m").getField(p).as(p)): _*)
  }
}
