package graft.etl

import graft.ops.Cols._
import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** The player_summary cascade: game rounds -> 5min -> 1h -> 1d -> 1m.
  *
  * Faithful re-expression of task-executor/player_summary modules:
  *  - 5min tier: wide sum battery + rtp over player_profit_log with robot
  *    filter, clamped free/jp sums, inf/NaN -> 0
  *    (player_summary_5min.py:71-106)
  *  - ratio enrichment from game_sites + profit split
  *    (player_summary_5min.py:109-131)
  *  - risky flagging with ordered mask overrides
  *    (player_summary_5min.py:136-148)
  *  - coarser tiers re-aggregate the tier below; rtp is recomputed from the
  *    re-summed profit/bet (weighted, never an average of averages).
  *
  * Scale: game_sites is a tiny dim -> broadcast join, no fact shuffle for the
  * enrichment; the aggregation shuffles once on the 5-part key.
  */
object PlayerSummary {

  val keys = Seq("platform", "site_code", "game_code", "player_name", "country")

  private val sumCols = Seq(
    "b_amount", "w_amount", "fee_amount", "profit_amount", "refund_amount",
    "normal_amount", "bonus_amount", "free_amount", "jp_amount",
    "valid_amount", "cancel_amount")

  /** A2+A3+F8 battery for one slice of player_profit_log. */
  def fiveMin(profitLog: DataFrame, gameSites: DataFrame, slice: TaskSlice,
      cfg: RtpConfig = RtpConfig()): DataFrame = {
    val gteTs = slice.gte_time.toLocalDateTime
    val gte = gteTs.toString.replace('T', ' ')
    val lt = slice.lt_time.toLocalDateTime.toString.replace('T', ' ')

    val agg = profitLog
      .filter(inWindow(col("round_time"), gte, lt))
      .filter(col("is_robot") === 0)
      .filter(eqOrAll(col("platform"), slice.platform))
      .filter(eqOrAll(col("site_code"), slice.site_code))
      .filter(eqOrAll(col("game_code"), slice.game_code))
      .groupBy(keys.map(col): _*)
      .agg(
        count(col("bet")).as("b_count"),
        sum(col("bet")).as("b_amount"),
        sum(col("win")).as("w_amount"),
        sum(col("fee")).as("fee_amount"),
        sum(col("profit")).as("profit_amount"),
        sum(col("refund")).as("refund_amount"),
        sum(col("normal_value")).as("normal_amount"),
        sum(col("bonus_value")).as("bonus_amount"),
        sumClamped(col("free_value")).as("free_amount"),
        sumClamped(col("jp_value")).as("jp_amount"),
        sum(col("valid_value")).as("valid_amount"),
        sum(col("cancel_value")).as("cancel_amount"),
        safeDiv(sum(col("profit")), sum(col("bet"))).as("rtp"))

    // J1: ratio enrichment — broadcast the game_sites dim, miss -> ratio 0
    // (player_summary_5min.py:116-119).
    val dim = gameSites.select(col("platform"), col("code"), col("ratio"))
    val enriched = agg
      .join(broadcast(dim),
        agg("platform") === dim("platform") && agg("site_code") === dim("code"), "left")
      .drop(dim("platform")).drop(dim("code"))
      .na.fill(0.0, Seq("ratio"))
      // F7: profit split (player_summary_5min.py:121-123).
      .withColumn("p_before_amount", col("profit_amount"))
      .withColumn("p_after_amount", col("profit_amount") * (lit(1.0) - col("ratio")))
      .withColumn("tg_after_amount", col("profit_amount") * col("ratio"))
      // F2: time columns stamped from the slice start.
      .withColumn("summary_date",
        lit(gteTs.format(java.time.format.DateTimeFormatter.BASIC_ISO_DATE).toInt))
      .withColumn("hours", lit(gteTs.getHour))
      .withColumn("mins", lit(gteTs.getMinute))
      .withColumn("start_time", lit(gte).cast("timestamp"))

    checkIfRisky(enriched, cfg)
  }

  /** Backfill/catch-up path: ALL 5-min slices inside `[gte, lt)` in one
    * aggregation (cf. TransSummary.fiveMinRange) — slice stamps from the
    * floored round_time; identical to per-slice [[fiveMin]] for aligned
    * slices. */
  def fiveMinRange(profitLog: DataFrame, gameSites: DataFrame, gte: String, lt: String,
      cfg: RtpConfig = RtpConfig()): DataFrame = {
    val floored = graft.time.Slicer.floorTo(col("round_time").cast("timestamp"), "5min")
    val base = profitLog
      .filter(col("is_robot") === 0)
      .filter(inWindow(col("round_time"), gte, lt))
      .groupBy((keys.map(col) :+ floored.as("start_time")): _*)
      .agg(
        count(col("bet")).as("b_count"),
        sum(col("bet")).as("b_amount"),
        sum(col("win")).as("w_amount"),
        sum(col("fee")).as("fee_amount"),
        sum(col("profit")).as("profit_amount"),
        sum(col("refund")).as("refund_amount"),
        sum(col("normal_value")).as("normal_amount"),
        sum(col("bonus_value")).as("bonus_amount"),
        sumClamped(col("free_value")).as("free_amount"),
        sumClamped(col("jp_value")).as("jp_amount"),
        sum(col("valid_value")).as("valid_amount"),
        sum(col("cancel_value")).as("cancel_amount"),
        safeDiv(sum(col("profit")), sum(col("bet"))).as("rtp"))
    val dim = gameSites.select(col("platform"), col("code"), col("ratio"))
    val enriched = base
      .join(broadcast(dim), base("platform") === dim("platform") && base("site_code") === dim("code"), "left")
      .drop(dim("platform")).drop(dim("code"))
      .na.fill(0.0, Seq("ratio"))
      .withColumn("p_before_amount", col("profit_amount"))
      .withColumn("p_after_amount", col("profit_amount") * (lit(1.0) - col("ratio")))
      .withColumn("tg_after_amount", col("profit_amount") * col("ratio"))
      .withColumn("summary_date", graft.ops.Cols.yyyymmdd(col("start_time")))
      .withColumn("hours", hour(col("start_time")))
      .withColumn("mins", minute(col("start_time")))
    checkIfRisky(enriched, cfg)
  }

  /** F1: ordered mask semantics (player_summary_5min.py:136-148) — base rule
    * first, then the unconditional profit override. Encoded as a single
    * `when` cascade with the LAST pandas mask as the FIRST branch (later
    * masks win in pandas; first match wins in `when`). */
  def checkIfRisky(report: DataFrame, cfg: RtpConfig = RtpConfig()): DataFrame =
    report.withColumn("is_risky",
      when(col("profit_amount") >= cfg.profitUnconditional, 1)
        .when(col("profit_amount") >= cfg.profitThreshold &&
          col("b_count") >= cfg.betCountThreshold &&
          col("rtp") >= cfg.rtpThreshold, 1)
        .otherwise(0))

  /** A4 rollup step shared by 1h/1d/1m: sum the presummed battery, recompute
    * rtp from the re-summed profit/bet, carry ratio with first() (MariaDB
    * non-strict GROUP BY made deterministic), rebuild the profit split. */
  private def reAgg(prev: DataFrame, slice: TaskSlice): DataFrame =
    prev
      .filter(eqOrAll(col("platform"), slice.platform))
      .filter(eqOrAll(col("site_code"), slice.site_code))
      .filter(eqOrAll(col("game_code"), slice.game_code))
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("b_count")).as("b_count"),
        sumCols.map(c => sum(col(c)).as(c)) :+
          first(col("ratio")).as("ratio"): _*)
      .withColumn("rtp", safeDiv(col("profit_amount"), col("b_amount")))
      .withColumn("p_before_amount", col("profit_amount"))
      .withColumn("p_after_amount", col("profit_amount") * (lit(1.0) - col("ratio")))
      .withColumn("tg_after_amount", col("profit_amount") * col("ratio"))

  def oneHour(fiveMinTier: DataFrame, slice: TaskSlice, cfg: RtpConfig = RtpConfig()): DataFrame = {
    val g = slice.gte_time.toLocalDateTime
    val dateInt = g.format(java.time.format.DateTimeFormatter.BASIC_ISO_DATE).toInt
    val rolled = reAgg(
      fiveMinTier.filter(col("summary_date") === dateInt && col("hours") === g.getHour), slice)
      .withColumn("summary_date", lit(dateInt))
      .withColumn("hours", lit(g.getHour))
      .withColumn("start_time", lit(g.toString.replace('T', ' ')).cast("timestamp"))
    checkIfRisky(rolled, cfg)
  }

  def oneDay(oneHourTier: DataFrame, slice: TaskSlice, cfg: RtpConfig = RtpConfig()): DataFrame = {
    val g = slice.gte_time.toLocalDateTime
    val dateInt = g.format(java.time.format.DateTimeFormatter.BASIC_ISO_DATE).toInt
    val rolled = reAgg(oneHourTier.filter(col("summary_date") === dateInt), slice)
      .withColumn("summary_date", lit(dateInt))
      .withColumn("start_time", lit(g.toString.replace('T', ' ')).cast("timestamp"))
    checkIfRisky(rolled, cfg)
  }

  def oneMonth(oneDayTier: DataFrame, slice: TaskSlice, cfg: RtpConfig = RtpConfig()): DataFrame = {
    val g = slice.gte_time.toLocalDateTime
    val monthInt = g.getYear * 100 + g.getMonthValue
    val rolled = reAgg(
      oneDayTier.filter(
        col("summary_date") >= monthInt * 100 && col("summary_date") < (monthInt + 1) * 100),
      slice)
      .withColumn("summary_month", lit(monthInt))
      .withColumn("start_time", lit(g.toString.replace('T', ' ')).cast("timestamp"))
    checkIfRisky(rolled, cfg)
  }
}
