package graft.etl

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class WmaWindowSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("windowed all-days WMA equals the per-slice two-stage aggregation") {
    // Build a small 1d tier directly (keys x 12 days with varying sums).
    val rows = for {
      p <- Seq("u1", "u2"); d <- 1 to 12
    } yield ("P0", "S0", p, "THB", 20240100 + d, (d * 10 + p.hashCode.abs % 7).toDouble, d * 3.0)
    val tier1d = rows.toDF("platform", "site_code", "player_name", "country",
      "summary_date", "b_amount", "profit_amount")

    val windowed = RiskCtrl.playerWmaAllDays(tier1d)

    // per-slice reference computation for d = 2024-01-10: days [0102, 0110)
    val slice = TestData.slice("2024-01-10 00:00:00", "2024-01-11 00:00:00", "1D")
    val perSlice = tier1d
      .filter(col("summary_date") >= 20240102 && col("summary_date") < 20240110)
      .groupBy("platform", "site_code", "player_name", "country")
      .agg((sum("b_amount") / 7.0).as("b_wma_ref"), stddev_pop("b_amount").as("b_wmasd_ref"))

    val joined = windowed.filter(col("summary_date") === 20240110)
      .join(perSlice, Seq("platform", "site_code", "player_name", "country"))
      .filter(abs(col("b_wma") - col("b_wma_ref")) > 1e-9 ||
        abs(col("b_wmasd") - col("b_wmasd_ref")) > 1e-9)
    assert(joined.isEmpty, "windowed WMA diverged from the per-slice aggregation")

    // first day has an empty trailing frame -> null wma (no history)
    assert(windowed.filter(col("summary_date") === 20240101 && col("b_wma").isNotNull).isEmpty)
  }

  test("dep-log refresh: overwrite counts for known keys, append new, keep stale") {
    import graft.orchestrate.TaskLedger
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    def rowDf(gte: String, dep: Long, matched: Int) =
      Seq(("ALL", "ALL", "ALL", "a", "1H", ts(gte), ts(gte.replace("10:", "11:")), dep, matched))
        .toDF("platform", "site_code", "game_code", "assignee", "freq_type",
          "gte_time", "lt_time", "dep_count", "matched")

    val oldLog = rowDf("2024-01-01 10:00:00", 7L, 0)
      .unionByName(rowDf("2024-01-02 10:00:00", 12L, 1))
    val gated = rowDf("2024-01-01 10:00:00", 12L, 1)   // now complete
      .unionByName(rowDf("2024-01-03 10:00:00", 3L, 0)) // brand new
    val refreshed = TaskLedger.refreshDepLog(oldLog, gated).cache()

    assert(refreshed.count() === 3)
    val byGte = refreshed.collect().map(r => r.getAs[java.sql.Timestamp]("gte_time").toString -> r).toMap
    assert(byGte("2024-01-01 10:00:00.0").getAs[Long]("dep_count") === 12L)
    assert(byGte("2024-01-01 10:00:00.0").getAs[Int]("matched") === 1)
    assert(byGte("2024-01-02 10:00:00.0").getAs[Int]("matched") === 1)  // untouched
    assert(byGte("2024-01-03 10:00:00.0").getAs[Long]("dep_count") === 3L)
    refreshed.unpersist()

    // empty old log: gated rows become the log
    assert(TaskLedger.refreshDepLog(spark.emptyDataFrame, gated).count() === 2)
  }
}
