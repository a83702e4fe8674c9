package graft.streaming

import graft.SparkTestSession
import graft.queries.StreamingQueries
import org.scalatest.funsuite.AnyFunSuite

class StreamDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("s4 stream-stream interval join equals the batch interval join") {
    import spark.implicits._
    val s4 = StreamingQueries.s4StreamIntervalJoin(spark, sf)
    val batch = {
      val v = graft.ops.Cols.money(org.apache.spark.sql.functions.col("value"))
      import org.apache.spark.sql.functions._
      val ev = graft.Tables.events(spark, sf)
      val t = ev.filter(col("event_type") =!= "error").select(
        concat(lit("P"), (col("user_id") % 2).cast("string")).as("platform"),
        concat(lit("u"), col("user_id").cast("string")).as("player_name"),
        when(col("event_type") === "purchase", "IN")
          .when(col("event_type") === "view", "OUT").otherwise("XFER").as("trade_type"),
        v.cast("double").as("trade_value"),
        col("ts").cast("timestamp_ntz").as("trade_time"))
      val r = ev.filter(col("event_id") % 10 =!= 0).select(
        concat(lit("P"), (col("user_id") % 2).cast("string")).as("p2"),
        concat(lit("u"), col("user_id").cast("string")).as("n2"),
        concat(lit("g"), (col("event_id") % 3).cast("string")).as("game_code"),
        v.cast("double").as("bet"),
        col("ts").cast("timestamp_ntz").as("round_time"))
      t.join(r, col("platform") === col("p2") && col("player_name") === col("n2") &&
        col("round_time") >= col("trade_time") - expr("INTERVAL 5 MINUTES") &&
        col("round_time") <= col("trade_time") + expr("INTERVAL 5 MINUTES"))
        .drop("p2", "n2")
    }
    assert(s4.count() > 0)
    assert(s4.count() == batch.count())
    assert(s4.exceptAll(batch.select(s4.columns.map(org.apache.spark.sql.functions.col): _*)).isEmpty)
  }

  test("s3 (doubled input + watermark dedup) equals s1 exactly") {
    val s3 = StreamingQueries.s3StreamDedup(spark, sf)
    val s1 = StreamingQueries.s1StreamFiveMin(spark, sf)
    assert(s3.schema == s1.schema)
    val a = s3.collect().toSet
    val b = s1.collect().toSet
    assert(a == b, s"s3 minus s1: ${(a -- b).take(3)}; s1 minus s3: ${(b -- a).take(3)}")
  }
}
