package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered windowed funnel — the event-analytics staple: how many keys
  * complete step 1, then step 2 strictly later, then step 3, all inside a
  * horizon anchored at their step-1 time. Greedy-earliest semantics (each
  * step matches its EARLIEST qualifying event), which makes the result a
  * pure function of the event set — deterministic, replayable, oracle-able.
  *
  * Scale shape: one filtered aggregation per step plus one join per step,
  * all keyed on the funnel key — every shuffle is on the same key, so AQE
  * can reuse the exchange; no windows, no per-key event buffering. The
  * per-step frames shrink monotonically (survivors only), so later joins
  * get cheaper, and the step-count summary is a plan-side union of
  * single-row aggregates (no driver-side counting loop).
  */
object Funnel {

  /** `steps` are (name, predicate) in funnel order; `horizon` is a SQL
    * interval literal body, e.g. "24 HOURS". Output: one row per step —
    * (step, step_name, users, conversion) where conversion is the 6dp
    * fraction of step-1 keys reaching this step. */
  def funnel(events: DataFrame, keyCol: Column, tsCol: Column,
      steps: Seq[(String, Column)], horizon: String): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    val first = events.filter(steps.head._2)
      .groupBy(keyCol.as("k")).agg(min(tsCol).as("t"))
      .withColumn("deadline", col("t") + expr(s"INTERVAL $horizon"))
    val stages = steps.tail.scanLeft(first) { case (prev, (_, pred)) =>
      events.filter(pred)
        .select(keyCol.as("k"), tsCol.as("ts2"))
        .join(prev, "k")
        .filter(col("ts2") > col("t") && col("ts2") < col("deadline"))
        .groupBy("k").agg(min(col("ts2")).as("t"), min(col("deadline")).as("deadline"))
    }
    val counts = stages.zip(steps).zipWithIndex.map { case ((df, (name, _)), i) =>
      df.agg(count(lit(1)).as("users"))
        .select(lit(i + 1).as("step"), lit(name).as("step_name"), col("users"))
    }.reduce(_ union _)
    val total1 = counts.filter(col("step") === 1).select(col("users").as("u1"))
    counts.crossJoin(total1)
      .select(col("step"), col("step_name"), col("users"),
        round(col("users").cast("double") / col("u1").cast("double"), 6).as("conversion"))
  }
}
