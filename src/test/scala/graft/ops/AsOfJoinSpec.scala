package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  // trades (left) and quotes (right) for one symbol each key
  lazy val trades = Seq(
    ("A", ts("2024-01-01 10:00:00"), 1L),
    ("A", ts("2024-01-01 10:00:05"), 2L),
    ("A", ts("2024-01-01 09:00:00"), 3L), // before any quote
    ("B", ts("2024-01-01 10:00:00"), 4L)
  ).toDF("sym", "trade_ts", "trade_id")

  lazy val quotes = Seq(
    ("A", ts("2024-01-01 09:59:59"), 10L, 1.0),
    ("A", ts("2024-01-01 10:00:00"), 11L, 2.0), // equal to trade 1's ts
    ("A", ts("2024-01-01 10:00:03"), 12L, 3.0),
    ("A", ts("2024-01-01 10:00:03"), 13L, 4.0), // tie: larger id wins
    ("B", ts("2024-01-01 09:00:00"), 14L, 5.0)
  ).toDF("sym", "quote_ts", "quote_id", "px")

  private def run(strict: Boolean) =
    AsOfJoin.asOfLeft(trades, quotes, Seq("sym"),
      leftTime = "trade_ts", rightTime = "quote_ts",
      payload = Seq("quote_id", "quote_ts", "px"),
      strict = strict, tieBreak = Seq("quote_id"))
      .collect().map(r => r.getAs[Long]("trade_id") ->
        (if (r.isNullAt(r.fieldIndex("quote_id"))) None
         else Some(r.getAs[Long]("quote_id")))).toMap

  test("strict as-of excludes the equal-time quote and keeps left rows unmatched before any quote") {
    val m = run(strict = true)
    assert(m(1L) === Some(10L)) // 10:00:00 quote NOT eligible (strict <)
    assert(m(2L) === Some(13L)) // tie at 10:00:03 -> larger quote_id
    assert(m(3L) === None)      // no quote before 09:00
    assert(m(4L) === Some(14L)) // per-key isolation
  }

  test("non-strict as-of takes the equal-time quote") {
    val m = run(strict = false)
    assert(m(1L) === Some(11L))
    assert(m(2L) === Some(13L))
    assert(m(3L) === None)
  }

  test("payload columns are null (not dropped rows) for unmatched left rows") {
    val out = AsOfJoin.asOfLeft(trades, quotes, Seq("sym"),
      "trade_ts", "quote_ts", Seq("quote_id", "quote_ts", "px"),
      strict = true, tieBreak = Seq("quote_id"))
    assert(out.count() === trades.count()) // left outer: every trade kept
    val unmatched = out.filter("trade_id = 3").collect()(0)
    assert(unmatched.isNullAt(unmatched.fieldIndex("px")))
    assert(unmatched.getAs[String]("sym") === "A") // left columns intact
  }

  test("matches a per-row reference computation on random data") {
    val rnd = new scala.util.Random(7)
    val l = (1 to 200).map(i => ("k" + rnd.nextInt(5), ts(f"2024-01-01 10:${rnd.nextInt(60)}%02d:${rnd.nextInt(60)}%02d"), i.toLong))
    val r = (1 to 300).map(i => ("k" + rnd.nextInt(5), ts(f"2024-01-01 10:${rnd.nextInt(60)}%02d:${rnd.nextInt(60)}%02d"), i.toLong, rnd.nextDouble()))
    val lDf = l.toDF("k", "lt", "lid")
    val rDf = r.toDF("k", "rt", "rid", "v")
    val got = AsOfJoin.asOfLeft(lDf, rDf, Seq("k"), "lt", "rt",
      Seq("rid", "rt", "v"), strict = true, tieBreak = Seq("rid"))
      .collect().map(x => x.getAs[Long]("lid") ->
        (if (x.isNullAt(x.fieldIndex("rid"))) -1L else x.getAs[Long]("rid"))).toMap
    l.foreach { case (k, lt, lid) =>
      val want = r.filter(q => q._1 == k && q._2.before(lt))
        .sortBy(q => (q._2.getTime, q._3)).lastOption.map(_._3).getOrElse(-1L)
      assert(got(lid) === want, s"lid=$lid")
    }
  }
}
