package graft.orchestrate

import graft.ops.Cols._
import graft.time.Slicer
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The task-board orchestration layer: DB-as-queue re-expressed as a parquet
  * ledger of `TaskSlice` rows (task-producer and task-executor/utils/
  * ExecUtils.py).
  *
  * The reference's producer cycle (main.py:61-71): scan per-key watermarks ->
  * extend to now with freq-aware ceiling -> explode into slices -> publish.
  * Every step below is set-based; the reference's per-row loops (N+1 dep
  * counts GetTaskDepCount.py:39-65, row-at-a-time status UPDATEs
  * ExecUtils.py:34-84) become single joins/aggregations.
  */
object TaskLedger {

  val taskKeys = Seq("platform", "site_code", "game_code", "assignee")

  /** A12: per-key low watermark — max(lt_time) per (platform, site_code,
    * game_code, assignee) (ScanTaskBoard.py:18-21). MariaDB's non-strict
    * GROUP BY returned arbitrary companion columns; the engine pins them with
    * max_by(_, lt_time) for deterministic semantics. */
  def watermarkScan(board: DataFrame): DataFrame =
    board.groupBy(taskKeys.map(col): _*)
      .agg(
        max(col("lt_time")).as("lt_time"),
        max_by(col("report_class"), col("lt_time")).as("report_class"),
        max_by(col("freq_type"), col("lt_time")).as("freq_type"),
        max_by(col("level"), col("lt_time")).as("level"))

  /** S8: union scan of both boards with a rerun tag (ExecUtils.py:11-31). */
  def scanUndone(taskBoard: DataFrame, rerunBoard: DataFrame, reportClass: String): DataFrame =
    taskBoard.filter(col("done") === 0 && col("report_class") === reportClass)
      .withColumn("is_rerun", lit(0))
      .unionByName(
        rerunBoard.filter(col("done") === 0 && col("report_class") === reportClass)
          .withColumn("is_rerun", lit(1)))
      // O1: priority ordering (ScasTransSummaryTask.py:14).
      .orderBy(col("level"), col("gte_time"))

  /** Producer: extend each watermark to `now`, ceiled per frequency
    * (GetNewTaskList.py:34-71: gte := last lt; lt := ceil(now) for 1H/1D/1M,
    * raw now for 5min — the slicer only emits whole slices anyway), then
    * explode into publishable slices. `now` is injected (SURVEY §7.4.4). */
  def newTasks(watermarks: DataFrame, now: java.sql.Timestamp): DataFrame = {
    val nowLit = lit(now.toLocalDateTime.toString.replace('T', ' ')).cast("timestamp")
    val ranged = watermarks
      .withColumn("gte_time", col("lt_time"))
      .withColumn("lt_time",
        when(col("freq_type") === "1H", Slicer.ceilTo(nowLit, "1H"))
          .when(col("freq_type") === "1D", Slicer.ceilTo(nowLit, "1D"))
          .when(col("freq_type") === "1M", Slicer.ceilTo(nowLit, "1M"))
          .otherwise(nowLit))
    Slicer.explodeSlices(ranged)
      .withColumn("create_time", nowLit)
      .withColumn("done", lit(0))
      .withColumn("retry", lit(0))
  }

  /** A11 set-based dependency gate (GetTaskDepCount.py:27-92 runs one COUNT
    * query per coarse task; here: ONE aggregation of finished finer tasks
    * joined to the coarse tasks, then the 12/24/days-in-month threshold).
    *
    * A coarse task is released when every finer slice inside its window is
    * done: 1H needs 12 x 5min, 1D needs 24 x 1H, 1M needs days-in-month x 1D.
    */
  def depGate(coarseTasks: DataFrame, board: DataFrame): DataFrame = {
    val finerOf = typedlit(Map("1H" -> "5min", "1D" -> "1H", "1M" -> "1D"))
    val done = board.filter(col("done") === 1)
      .select(taskKeys.map(col) :+ col("freq_type").as("dep_freq") :+
        col("gte_time").as("dep_gte") :+ col("lt_time").as("dep_lt"): _*)

    val expected =
      when(col("freq_type") === "1H", lit(12))
        .when(col("freq_type") === "1D", lit(24))
        .when(col("freq_type") === "1M",
          dayofmonth(last_day(col("gte_time"))))
        .otherwise(lit(0))

    val counted = coarseTasks.alias("t")
      .join(done.alias("d"),
        taskKeys.map(k => col(s"t.$k") === col(s"d.$k")).reduce(_ && _) &&
          col("d.dep_freq") === element_at(finerOf, col("t.freq_type")) &&
          col("d.dep_gte") >= col("t.gte_time") && col("d.dep_lt") <= col("t.lt_time"),
        "left")
      .groupBy((taskKeys.map(k => col(s"t.$k").as(k)) :+ col("t.freq_type").as("freq_type") :+
        col("t.gte_time").as("gte_time") :+ col("t.lt_time").as("lt_time")): _*)
      .agg(count(col("d.dep_gte")).as("dep_count"))

    counted.withColumn("matched", (col("dep_count") >= expected).cast("int"))
  }

  /** S9 set-based status update: mark the given slices done with runtime
    * accounting (ExecUtils.py:56-84's per-row UPDATE loop as one join). */
  def markDone(board: DataFrame, completed: DataFrame, now: java.sql.Timestamp): DataFrame = {
    val nowLit = lit(now.toLocalDateTime.toString.replace('T', ' ')).cast("timestamp")
    val hit = completed
      .select(taskKeys.map(col) :+ col("freq_type") :+ col("gte_time") :+ col("lt_time"): _*)
      .withColumn("_hit", lit(1))
    board.join(hit, taskKeys ++ Seq("freq_type", "gte_time", "lt_time"), "left")
      .withColumn("done", when(col("_hit") === 1, 1).otherwise(col("done")))
      .withColumn("complete_time", when(col("_hit") === 1, nowLit).otherwise(col("complete_time")))
      .withColumn("runtime_second",
        when(col("_hit") === 1,
          unix_timestamp(nowLit) - unix_timestamp(coalesce(col("apply_time"), nowLit)))
          .otherwise(col("runtime_second")))
      .drop("_hit")
  }
}
