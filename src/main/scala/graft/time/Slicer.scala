package graft.time

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time slicing — the reference's core streaming primitive.
  *
  * The reference turns a `[gte_time, lt_time)` range plus a frequency into a
  * list of task slices (task-producer/utils/TaskUtils.py:53-101), with
  * floor/ceil alignment rules used by both the producer
  * (task-producer/task_producer/GetNewTaskList.py:59-69) and the rerun
  * cascade (task-producer/rerun_producer/GetRelatedTimeSplit.py:33-84).
  *
  * Everything here is a column expression (sequence/explode — F6), so slicing
  * a million-row task board is one distributed select, not a driver loop.
  *
  * Month semantics reproduce the reference exactly for aligned (midnight,
  * month-start) inputs: a 1M slice is emitted for every whole month fully
  * inside `[gte, lt)`, snapped to month boundaries (TaskUtils.py:76-86 via
  * pandas MonthEnd). The reference's behavior for misaligned month inputs
  * (slice start snaps BEFORE gte — catch-up semantics) is reproduced too.
  */
object Slicer {

  val Freqs = Seq("5min", "1H", "1D", "1M")

  /** Step of one frequency unit as a day-time interval column (F4). */
  private def unitInterval(freq: String): Column = freq match {
    case "5min" => expr("INTERVAL 5 MINUTES")
    case "1H"   => expr("INTERVAL 1 HOUR")
    case "1D"   => expr("INTERVAL 1 DAY")
    case other  => throw new IllegalArgumentException(s"no fixed interval for freq $other")
  }

  /** F3: floor a timestamp to the start of its frequency bucket. */
  def floorTo(c: Column, freq: String): Column = freq match {
    case "5min" =>
      date_trunc("hour", c) + make_dt_interval(lit(0), lit(0), floor(minute(c) / 5) * 5, lit(0))
    case "1H" => date_trunc("hour", c)
    case "1D" => date_trunc("day", c)
    case "1M" => date_trunc("month", c)
    case other => throw new IllegalArgumentException(s"unknown freq $other")
  }

  /** F3: ceil — boundary-exact timestamps stay put (pandas `.ceil` and the
    * rerun month rule "exactly at the boundary -> don't carry",
    * GetRelatedTimeSplit.py:63-73). */
  def ceilTo(c: Column, freq: String): Column = freq match {
    case "1M" =>
      when(c === date_trunc("month", c), c)
        .otherwise(add_months(date_trunc("month", c), 1).cast(dataTypeOf(c)))
    case f =>
      when(c === floorTo(c, f), c).otherwise(floorTo(c, f) + unitInterval(f))
  }

  // add_months returns DATE; cast back through the original column's family.
  // We standardize on timestamp: caller columns are timestamps.
  private def dataTypeOf(c: Column): String = "timestamp"

  /** Explode one task row (gte_time, lt_time, freq_type) into its slices.
    *
    * Fixed frequencies: slice starts are `sequence(gte, lt - unit, unit)` —
    * aligned to gte itself, exactly like `pd.date_range(gte, lt - td, freq)`
    * (TaskUtils.py:66-71); each slice is `[start, start + unit)`.
    *
    * 1M: month-ends within `[gte, lt - 1 day]` define the slices
    * (TaskUtils.py:76-86): slice = `[month_start(e), e + 1 day)`.
    *
    * Input columns are preserved; gte_time/lt_time are replaced by the
    * per-slice bounds. Rows whose range is empty produce no slices.
    */
  def explodeSlices(tasks: DataFrame): DataFrame = {
    val cols = tasks.columns.filterNot(Seq("gte_time", "lt_time").contains)
    val gte = col("gte_time").cast("timestamp")
    val lt = col("lt_time").cast("timestamp")

    def fixed(freq: String) =
      tasks.filter(col("freq_type") === freq)
        .filter(gte + unitInterval(freq) <= lt)
        .withColumn("slice_gte",
          explode(sequence(gte, lt - unitInterval(freq), unitInterval(freq))))
        .withColumn("slice_lt", col("slice_gte") + unitInterval(freq))

    // Month-end dates e in [gte, lt - 1d]; slice = [month_start(e), e + 1d).
    // Candidate month-ends spanned by the range, then filtered — mirrors
    // pd.date_range(gte, lt - 1d, freq='1M').
    val monthly =
      tasks.filter(col("freq_type") === "1M")
        .withColumn("m_start",
          explode(sequence(
            date_trunc("month", gte),
            date_trunc("month", lt),
            expr("INTERVAL 1 MONTH"))))
        .withColumn("m_end", add_months(col("m_start"), 1).cast("timestamp") - expr("INTERVAL 1 DAY"))
        .filter(col("m_end") >= gte && col("m_end") <= lt - expr("INTERVAL 1 DAY"))
        .withColumn("slice_gte", col("m_start"))
        .withColumn("slice_lt", add_months(col("m_start"), 1).cast("timestamp"))
        .drop("m_start", "m_end")

    val exploded = Freqs.filterNot(_ == "1M").map(fixed).reduce(_ unionByName _)
      .unionByName(monthly)

    exploded
      .drop("gte_time", "lt_time")
      .withColumnsRenamed(Map("slice_gte" -> "gte_time", "slice_lt" -> "lt_time"))
      .select((cols.map(col) :+ col("gte_time") :+ col("lt_time")): _*)
  }

  /** The rerun cascade (GetRelatedTimeSplit.py:33-84): one manual-rerun row
    * with flags 5min/1h/1d/1m becomes up to four aligned task rows, one per
    * enabled frequency, with floor/ceil realignment and the month-boundary
    * carry rule. Zero-width rows (gte == lt after alignment) are dropped.
    */
  def cascadeRerun(requests: DataFrame): DataFrame = {
    val gte = col("gte_time").cast("timestamp")
    val lt = col("lt_time").cast("timestamp")

    def variant(flag: String, freq: String, level: Int, g: Column, l: Column) =
      requests.filter(col(flag) === 1)
        .withColumn("assignee", concat(col("report_class"), lit("_" + flag)))
        .withColumn("freq_type", lit(freq))
        .withColumn("level", lit(level))
        .withColumn("gte_time", g)
        .withColumn("lt_time", l)

    val v5 = variant("5min", "5min", 100, gte, lt)
    val v1h = variant("1h", "1H", 200, floorTo(gte, "1H"), ceilTo(lt, "1H"))
    val v1d = variant("1d", "1D", 300, floorTo(gte, "1D"), ceilTo(lt, "1D"))
    val v1m = variant("1m", "1M", 400, floorTo(gte, "1M"), ceilTo(lt, "1M"))

    v5.unionByName(v1h).unionByName(v1d).unionByName(v1m)
      .filter(col("gte_time") =!= col("lt_time"))
      .drop("5min", "1h", "1d", "1m")
  }
}
