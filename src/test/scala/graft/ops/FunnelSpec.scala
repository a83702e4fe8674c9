package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FunnelSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("funnel: ordered steps, strict ordering, horizon cutoff, greedy-earliest") {
    val ev = Seq(
      // u1 completes: view 10:00 -> click 11:00 -> purchase 12:00
      (1L, "view", "2024-01-01 10:00:00"), (1L, "click", "2024-01-01 11:00:00"),
      (1L, "purchase", "2024-01-01 12:00:00"),
      // u2: click BEFORE view only -> stops at view
      (2L, "click", "2024-01-01 09:00:00"), (2L, "view", "2024-01-01 10:00:00"),
      // u3: purchase outside the 24h horizon -> stops at click
      (3L, "view", "2024-01-01 10:00:00"), (3L, "click", "2024-01-01 11:00:00"),
      (3L, "purchase", "2024-01-02 11:00:00"),
      // u4: greedy-earliest — the EARLIEST view anchors the horizon, so the
      // late purchase (25h after first view, 1h after second) does NOT count
      (4L, "view", "2024-01-01 00:00:00"), (4L, "click", "2024-01-01 01:00:00"),
      (4L, "view", "2024-01-02 00:30:00"), (4L, "purchase", "2024-01-02 01:00:00"),
      // u5: never views -> not even step 1
      (5L, "purchase", "2024-01-01 10:00:00"))
      .map { case (u, t, w) => (u, t, ts(w)) }.toDF("user_id", "event_type", "ts")
    val out = Funnel.funnel(ev, col("user_id"), col("ts"),
        Seq("view" -> (col("event_type") === "view"),
          "click" -> (col("event_type") === "click"),
          "purchase" -> (col("event_type") === "purchase")),
        horizon = "24 HOURS")
      .orderBy("step").as[(Int, String, Long, Double)].collect()
    assert(out.map(r => (r._1, r._2, r._3)).toSeq ==
      Seq((1, "view", 4L), (2, "click", 3L), (3, "purchase", 1L)), s"got ${out.toSeq}")
    assert(out.map(_._4).toSeq == Seq(1.0, 0.75, 0.25))
  }
}
