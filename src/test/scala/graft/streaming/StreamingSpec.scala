package graft.streaming

import graft.SparkTestSession
import graft.etl.TestData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("streaming 5min tier over the fixture log equals the batch aggregation") {
    // Stage the fixture-derived value log as a file-source stream input.
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    val vlog = TestData.valueLog(spark)
    vlog.write.mode("overwrite").parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema

    val stream = spark.readStream.schema(schema).parquet(s"$dir/in")
    val agg = StreamingSummary.transFiveMinStream(stream)
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("stream_5min")
      .trigger(Trigger.Once())
      .start()
    q.awaitTermination(120000)

    val got = spark.table("stream_5min")
      .groupBy("platform", "site_code", "player_name", "country")
      .agg(sum("trans_in_amount").as("in_amt"), sum("trans_in_count").as("in_cnt"))
    val want = vlog.filter(col("trade_status") === "SUCCESS")
      .groupBy("platform", "site_code", "player_name", "country")
      .agg(
        sum(when(col("trade_type") === "IN", col("value")).otherwise(0.0)).as("w_amt"),
        count(when(col("trade_type") === "IN", 1)).as("w_cnt"))
    val bad = got.join(want, Seq("platform", "site_code", "player_name", "country"), "full_outer")
      .filter(abs(coalesce(col("in_amt"), lit(0.0)) - coalesce(col("w_amt"), lit(0.0))) > 1e-6 ||
        coalesce(col("in_cnt"), lit(0L)) =!= coalesce(col("w_cnt"), lit(0L)))
    assert(bad.isEmpty, "streaming aggregation diverged from batch")
    assert(spark.table("stream_5min").count() > 0)
  }

  test("foreachBatch sink writes partition-overwritten report slices") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_sink").toString
    val vlog = TestData.valueLog(spark)
      .filter(col("trade_time") < lit("2024-01-03 00:00:00"))
    vlog.write.mode("overwrite").parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema
    val stream = spark.readStream.schema(schema).parquet(s"$dir/in")

    val q = StreamingSummary.startTransFiveMin(stream, s"$dir/table", s"$dir/ckpt")
    q.processAllAvailable()
    q.stop()

    val table = spark.read.parquet(s"$dir/table")
    assert(table.count() > 0)
    assert(table.select("summary_date").distinct().count() === 2) // Jan 1 + Jan 2
    val direct = vlog.filter(col("trade_status") === "SUCCESS")
      .agg(sum(when(col("trade_type") === "IN", col("value")).otherwise(0.0))).head.getDouble(0)
    val streamed = table.agg(sum("trans_in_amount")).head.getDouble(0)
    assert(math.abs(direct - streamed) < 1e-6)
  }

  test("alert throttle state function: cooldown, cap, reset (pure, no stream)") {
    import StreamingSummary._
    // Drive through the Dataset API in batch mode (same code path/planner as
    // the streaming query uses for flatMapGroupsWithState).
    val minute = 60000L
    val base = 1700000000000L // away from the epoch-zero initial state
    val inputs = Seq(
      AlertInput("k1", base + 0 * minute, isRisky = true),      // fires (count 1)
      AlertInput("k1", base + (0 * minute) + 30000, isRisky = true), // 30s later: cooldown
      AlertInput("k1", base + 2 * minute, isRisky = true),      // fires (count 2)
      AlertInput("k1", base + 4 * minute, isRisky = true),      // fires (3)
      AlertInput("k1", base + 6 * minute, isRisky = true),      // fires (4)
      AlertInput("k1", base + 8 * minute, isRisky = true),      // fires (5 = cap)
      AlertInput("k1", base + 10 * minute, isRisky = true),     // capped: no alert
      AlertInput("k1", base + 12 * minute, isRisky = false),    // reset
      AlertInput("k1", base + 14 * minute, isRisky = true))     // fires again (count 1)
      .toDS()
    val out = StreamingSummary.throttleAlerts(inputs).collect().sortBy(_.eventTimeMillis)
    assert(out.map(_.sendAlert).toSeq ===
      Seq(true, false, true, true, true, true, false, false, true))
    assert(out.last.alertCount === 1)
  }
}
