package graft.plans

import graft.SparkTestSession
import graft.ops.AsOfJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native sort-merge as-of exec must (a) equal the union+window
  * formulation row for row on every semantic corner, (b) plan as ONE
  * merge node over two exchanges — no Window, no union — and (c) expose its
  * output partitioning so downstream keyed stages skip their exchange. */
class AsOfMergeJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  lazy val trades = Seq(
    ("A", ts("2024-01-01 10:00:00"), 1L),
    ("A", ts("2024-01-01 10:00:05"), 2L),
    ("A", ts("2024-01-01 09:00:00"), 3L),
    ("B", ts("2024-01-01 10:00:00"), 4L)
  ).toDF("sym", "trade_ts", "trade_id")

  lazy val quotes = Seq(
    ("A", ts("2024-01-01 09:59:59"), 10L, 1.0),
    ("A", ts("2024-01-01 10:00:00"), 11L, 2.0),
    ("A", ts("2024-01-01 10:00:03"), 12L, 3.0),
    ("A", ts("2024-01-01 10:00:03"), 13L, 4.0),
    ("B", ts("2024-01-01 09:00:00"), 14L, 5.0)
  ).toDF("sym", "quote_ts", "quote_id", "px")

  private def run(strict: Boolean) =
    AsOfMergeJoin.asOfLeft(trades, quotes, Seq("sym"),
      leftTime = "trade_ts", rightTime = "quote_ts",
      payload = Seq("quote_id", "quote_ts", "px"),
      strict = strict, tieBreak = Seq("quote_id"))
      .collect().map(r => r.getAs[Long]("trade_id") ->
        (if (r.isNullAt(r.fieldIndex("quote_id"))) None
         else Some(r.getAs[Long]("quote_id")))).toMap

  test("strict/non-strict/tie/unmatched semantics match the documented contract") {
    val s = run(strict = true)
    assert(s(1L) === Some(10L)) // equal-time quote excluded under strict
    assert(s(2L) === Some(13L)) // tie at same ts -> larger tieBreak wins
    assert(s(3L) === None)      // nothing earlier -> null payload, row kept
    assert(s(4L) === Some(14L)) // per-key isolation
    val n = run(strict = false)
    assert(n(1L) === Some(11L)) // equal-time quote taken when non-strict
    assert(n(2L) === Some(13L))
    assert(n(3L) === None)
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("equals the union+window formulation bit for bit on random data, both strictness modes") {
    val rnd = new scala.util.Random(11)
    val l = (1 to 500).map(i => ("k" + rnd.nextInt(7),
      ts(f"2024-01-01 10:${rnd.nextInt(60)}%02d:${rnd.nextInt(60)}%02d"), i.toLong))
      .toDF("k", "lt", "lid")
    val r = (1 to 800).map(i => ("k" + rnd.nextInt(9), // keys 7,8 never match
      ts(f"2024-01-01 10:${rnd.nextInt(60)}%02d:${rnd.nextInt(60)}%02d"), i.toLong, rnd.nextDouble()))
      .toDF("k", "rt", "rid", "v")
    for (strict <- Seq(true, false)) {
      val merge = AsOfMergeJoin.asOfLeft(l, r, Seq("k"), "lt", "rt",
        Seq("rid", "rt", "v"), strict = strict, tieBreak = Seq("rid"))
      val window = AsOfJoin.asOfLeft(l, r, Seq("k"), "lt", "rt",
        Seq("rid", "rt", "v"), strict = strict, tieBreak = Seq("rid"))
      assert(sortedRows(merge) === sortedRows(window), s"strict=$strict")
    }
  }

  test("self-join from one scan (q20 shape): sides keep distinct attributes") {
    val ev = Seq(
      (1L, "view", ts("2024-01-01 09:00:00"), 10L),
      (2L, "purchase", ts("2024-01-01 10:00:00"), 10L),
      (3L, "view", ts("2024-01-01 11:00:00"), 10L),
      (4L, "purchase", ts("2024-01-01 12:00:00"), 10L),
      (5L, "purchase", ts("2024-01-01 08:00:00"), 11L)
    ).toDF("event_id", "event_type", "ets", "user_id")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id", $"ets".as("purchase_ts"))
    val views = ev.filter($"event_type" === "view")
      .select($"user_id", $"event_id".as("view_id"), $"ets".as("view_ts"))
    val out = AsOfMergeJoin.asOfLeft(purchases, views, Seq("user_id"),
      "purchase_ts", "view_ts", Seq("view_id", "view_ts"),
      strict = true, tieBreak = Seq("view_id"))
      .collect().map(x => x.getAs[Long]("purchase_id") ->
        (if (x.isNullAt(x.fieldIndex("view_id"))) -1L else x.getAs[Long]("view_id"))).toMap
    assert(out === Map(2L -> 1L, 4L -> 3L, 5L -> -1L))
  }

  test("null handling: null right times dropped, null left times match nothing") {
    val l = Seq(("A", Option(ts("2024-01-01 10:00:00")), 1L),
      ("A", Option.empty[java.sql.Timestamp], 2L)).toDF("k", "lt", "lid")
    val r = Seq(("A", Option(ts("2024-01-01 09:00:00")), 10L),
      ("A", Option.empty[java.sql.Timestamp], 11L)).toDF("k", "rt", "rid")
    val got = AsOfMergeJoin.asOfLeft(l, r, Seq("k"), "lt", "rt", Seq("rid"))
      .collect().map(x => x.getAs[Long]("lid") ->
        (if (x.isNullAt(x.fieldIndex("rid"))) -1L else x.getAs[Long]("rid"))).toMap
    assert(got === Map(1L -> 10L, 2L -> -1L))
  }

  test("plans as one merge exec: no Window, no Union, two exchanges") {
    val df = AsOfMergeJoin.asOfLeft(trades, quotes, Seq("sym"),
      "trade_ts", "quote_ts", Seq("quote_id", "px"), strict = true,
      tieBreak = Seq("quote_id"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfMergeJoin"), plan)
    assert(!plan.contains("Window"), s"window machinery crept in:\n$plan")
    assert(!plan.toLowerCase.contains("union"), s"union crept in:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 2, plan)
  }

  test("output partitioning is reusable: downstream agg on the join keys adds no exchange") {
    val df = AsOfMergeJoin.asOfLeft(trades, quotes, Seq("sym"),
      "trade_ts", "quote_ts", Seq("quote_id", "px"), strict = true,
      tieBreak = Seq("quote_id"))
      .groupBy("sym").agg(count("*").as("n"), sum("px").as("s"))
    val plan = df.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 2,
      s"the agg above the as-of must reuse its partitioning:\n$plan")
    // and the result is still right
    val m = df.collect().map(r => r.getString(0) -> r.getAs[Long]("n")).toMap
    assert(m === Map("A" -> 3L, "B" -> 1L))
  }

  test("pushdown rule: unused left columns are pruned into the parquet ReadSchema") {
    val dir = java.nio.file.Files.createTempDirectory("graft_asof_prune").toString
    trades.withColumn("fat_a", lit("x")).withColumn("fat_b", lit(1.0))
      .write.mode("overwrite").parquet(s"$dir/trades")
    val fatTrades = spark.read.parquet(s"$dir/trades")
    val df = AsOfMergeJoin.asOfLeft(fatTrades, quotes, Seq("sym"),
      "trade_ts", "quote_ts", Seq("quote_id", "px"), strict = true)
      .select("trade_id", "quote_id")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfMergeJoin"), plan)
    assert(!plan.contains("fat_a") && !plan.contains("fat_b"),
      s"unused left columns must not reach the scan:\n$plan")
    assert(df.collect().length === 4)
  }

  test("pushdown rule: a limit above the join bounds the left side below it") {
    val df = AsOfMergeJoin.asOfLeft(trades, quotes, Seq("sym"),
      "trade_ts", "quote_ts", Seq("quote_id", "px"), strict = true).limit(2)
    val opt = df.queryExecution.optimizedPlan
    val joinNode = opt.collectFirst { case j: AsOfMergeJoinPlan => j }.get
    assert(joinNode.left.isInstanceOf[
      org.apache.spark.sql.catalyst.plans.logical.LocalLimit],
      s"limit must be copied below the join's left side:\n$opt")
    assert(df.collect().length === 2)
  }

  test("bucketed inputs: the as-of join plans with ZERO exchanges") {
    // Both sides pre-bucketed on the join key satisfy the exec's required
    // clustering — at 100 TB this is a shuffle-FREE point-in-time join over
    // co-located tables (sorts remain, but they are partition-local).
    val wh = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    Seq("asof_bkt_trades", "asof_bkt_quotes").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(wh, t))
    }
    graft.io.Sinks.writeBucketed(trades, "asof_bkt_trades", Seq("sym"), 4,
      sortCols = Seq("sym", "trade_ts"))
    graft.io.Sinks.writeBucketed(quotes, "asof_bkt_quotes", Seq("sym"), 4,
      sortCols = Seq("sym", "quote_ts"))
    val df = AsOfMergeJoin.asOfLeft(
      spark.table("asof_bkt_trades"), spark.table("asof_bkt_quotes"),
      Seq("sym"), "trade_ts", "quote_ts", Seq("quote_id", "px"),
      strict = true, tieBreak = Seq("quote_id"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfMergeJoin"), plan)
    assert(!plan.contains("Exchange"),
      s"bucketed as-of join must not shuffle:\n$plan")
    // and results equal the shuffling plain-input plan
    val plain = AsOfMergeJoin.asOfLeft(trades, quotes, Seq("sym"),
      "trade_ts", "quote_ts", Seq("quote_id", "px"),
      strict = true, tieBreak = Seq("quote_id"))
    assert(sortedRows(df) === sortedRows(plain))
  }

  test("empty right side: all left rows survive with null payload") {
    val got = AsOfMergeJoin.asOfLeft(trades, quotes.filter($"sym" === "none"),
      Seq("sym"), "trade_ts", "quote_ts", Seq("quote_id", "px"))
    assert(got.count() === 4)
    assert(got.filter($"quote_id".isNotNull).count() === 0)
  }
}
