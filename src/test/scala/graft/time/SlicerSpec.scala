package graft.time

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SlicerSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tasks(gte: String, lt: String, freq: String) =
    Seq(("ALL", freq, java.sql.Timestamp.valueOf(gte), java.sql.Timestamp.valueOf(lt)))
      .toDF("platform", "freq_type", "gte_time", "lt_time")

  test("5min slices tile one day exactly: 288 slices, no gaps, no overlaps") {
    val s = Slicer.explodeSlices(tasks("2024-01-01 00:00:00", "2024-01-02 00:00:00", "5min"))
      .orderBy("gte_time").collect()
    assert(s.length === 288)
    assert(s.head.getAs[java.sql.Timestamp]("gte_time") === java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
    assert(s.last.getAs[java.sql.Timestamp]("lt_time") === java.sql.Timestamp.valueOf("2024-01-02 00:00:00"))
    s.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[java.sql.Timestamp]("lt_time") === b.getAs[java.sql.Timestamp]("gte_time"))
    }
  }

  test("1H produces 24, 1D produces 1, partial trailing slices are withheld") {
    assert(Slicer.explodeSlices(tasks("2024-01-01 00:00:00", "2024-01-02 00:00:00", "1H")).count() === 24)
    assert(Slicer.explodeSlices(tasks("2024-01-01 00:00:00", "2024-01-02 00:00:00", "1D")).count() === 1)
    // lt mid-slice: the open slice must NOT be emitted (TaskUtils.py:44-47)
    assert(Slicer.explodeSlices(tasks("2024-01-01 00:00:00", "2024-01-01 00:57:00", "5min")).count() === 11)
    assert(Slicer.explodeSlices(tasks("2024-01-01 10:00:00", "2024-01-01 10:04:00", "5min")).count() === 0)
  }

  test("slices align to gte, not to the epoch (pd.date_range semantics)") {
    val s = Slicer.explodeSlices(tasks("2024-01-01 00:02:00", "2024-01-01 00:12:00", "5min"))
      .orderBy("gte_time").collect()
    assert(s.map(_.getAs[java.sql.Timestamp]("gte_time").toString) ===
      Array("2024-01-01 00:02:00.0", "2024-01-01 00:07:00.0"))
  }

  test("1M emits whole months snapped to month boundaries") {
    val s = Slicer.explodeSlices(tasks("2024-01-01 00:00:00", "2024-03-15 00:00:00", "1M"))
      .orderBy("gte_time").collect()
    assert(s.map(r => (r.getAs[java.sql.Timestamp]("gte_time").toString,
      r.getAs[java.sql.Timestamp]("lt_time").toString)) ===
      Array(("2024-01-01 00:00:00.0", "2024-02-01 00:00:00.0"),
        ("2024-02-01 00:00:00.0", "2024-03-01 00:00:00.0")))
    // open month (March) withheld; February (leap) handled
    val feb = Slicer.explodeSlices(tasks("2024-02-01 00:00:00", "2024-03-01 00:00:00", "1M")).collect()
    assert(feb.length === 1)
    assert(feb.head.getAs[java.sql.Timestamp]("lt_time").toString === "2024-03-01 00:00:00.0")
    // range too short for any whole month -> nothing
    assert(Slicer.explodeSlices(tasks("2024-01-02 00:00:00", "2024-01-30 00:00:00", "1M")).count() === 0)
  }

  test("1M mid-month gte snaps back to the month start (catch-up semantics)") {
    val s = Slicer.explodeSlices(tasks("2024-01-15 00:00:00", "2024-02-01 00:00:00", "1M")).collect()
    assert(s.length === 1)
    assert(s.head.getAs[java.sql.Timestamp]("gte_time").toString === "2024-01-01 00:00:00.0")
  }

  test("ceilTo: boundary-exact values stay; others advance to the boundary") {
    val df = Seq(
      java.sql.Timestamp.valueOf("2024-01-01 10:00:00"),
      java.sql.Timestamp.valueOf("2024-01-01 10:00:01"),
      java.sql.Timestamp.valueOf("2024-02-01 00:00:00"),
      java.sql.Timestamp.valueOf("2024-02-01 00:30:00")).toDF("ts")
    val got = df.select(
      Slicer.ceilTo(col("ts"), "1H").cast("string").as("h"),
      Slicer.ceilTo(col("ts"), "1D").cast("string").as("d"),
      Slicer.ceilTo(col("ts"), "1M").cast("string").as("m")).collect()
    assert(got(0).getString(0) === "2024-01-01 10:00:00")  // exact hour stays
    assert(got(1).getString(0) === "2024-01-01 11:00:00")
    assert(got(2).getString(2) === "2024-02-01 00:00:00")  // exact month stays
    assert(got(3).getString(2) === "2024-03-01 00:00:00")  // mid-month carries
  }

  test("cascadeRerun realigns and drops zero-width slices") {
    val req = Seq((
      "P0", "S0", "ALL", "trans_summary",
      java.sql.Timestamp.valueOf("2024-01-10 10:17:00"),
      java.sql.Timestamp.valueOf("2024-01-10 11:42:00"),
      1, 1, 1, 1))
      .toDF("platform", "site_code", "game_code", "report_class",
        "gte_time", "lt_time", "5min", "1h", "1d", "1m")
    val got = Slicer.cascadeRerun(req)
      .select("freq_type", "assignee", "level", "gte_time", "lt_time")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2),
        r.getTimestamp(3).toString, r.getTimestamp(4).toString)).toSet
    assert(got === Set(
      ("5min", "trans_summary_5min", 100, "2024-01-10 10:17:00.0", "2024-01-10 11:42:00.0"),
      ("1H", "trans_summary_1h", 200, "2024-01-10 10:00:00.0", "2024-01-10 12:00:00.0"),
      ("1D", "trans_summary_1d", 300, "2024-01-10 00:00:00.0", "2024-01-11 00:00:00.0"),
      ("1M", "trans_summary_1m", 400, "2024-01-01 00:00:00.0", "2024-02-01 00:00:00.0")))
  }

  test("cascadeRerun month rule: lt exactly at month boundary does not carry") {
    val req = Seq((
      "P0", "S0", "ALL", "x",
      java.sql.Timestamp.valueOf("2024-01-29 23:00:00"),
      java.sql.Timestamp.valueOf("2024-02-01 00:00:00"),
      0, 0, 0, 1))
      .toDF("platform", "site_code", "game_code", "report_class",
        "gte_time", "lt_time", "5min", "1h", "1d", "1m")
    val got = Slicer.cascadeRerun(req).select("gte_time", "lt_time").collect()
    assert(got.length === 1)
    assert(got.head.getTimestamp(0).toString === "2024-01-01 00:00:00.0")
    assert(got.head.getTimestamp(1).toString === "2024-02-01 00:00:00.0")
  }
}
