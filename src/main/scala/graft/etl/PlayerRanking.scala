package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** player_ranking_1d — the robot leaderboard
  * (task-executor/player_ranking/player_ranking_1d_vnd_ou_leaderboard.py).
  *
  * The reference drives this imperatively per board (site x game x room x
  * country): seed 20 robots, repeatedly simulate bets for 5 random robots
  * until every robot's win exceeds the best real player's win (the boards are
  * decorative leaderboards that must stay ahead of real players), then
  * re-rank. Randomness comes from unseeded `random.*` — the engine injects a
  * seed per board for determinism (SURVEY §7.4.4).
  *
  * Spark mapping: boards are independent and tiny (20 rows each), while the
  * number of boards scales with the site catalog — so the per-board
  * imperative loop runs inside `flatMapGroups` (one group = one board), which
  * distributes across executors. Everything around it (config explode F12,
  * 3-day anti filter P8, MAX(win) probe A8, ranking W1, bonus count A9) is
  * declarative DataFrame work.
  */
object PlayerRanking {

  val boardKeys = Seq("platform", "site_code", "game_code", "room_type", "country")

  /** F12: explode the nested site config (player_ranking…py:33-37) — one row
    * per (platform, site_code, game_code, room_type, country) combination. */
  def explodeConfig(spark: SparkSession, platform: String, siteCodes: Seq[String],
      gameCodes: Seq[String], roomTypes: Seq[String], countries: Seq[String]): DataFrame = {
    import spark.implicits._
    Seq(platform).toDF("platform")
      .withColumn("site_code", explode(typedlit(siteCodes)))
      .withColumn("game_code", explode(typedlit(gameCodes)))
      .withColumn("room_type", explode(typedlit(roomTypes)))
      .withColumn("country", explode(typedlit(countries)))
  }

  /** P8+O4: initial board — robots not shown in the last 3 days, 20 sampled
    * deterministically per board (player_ranking…py:120-155). */
  def initBoards(boards: DataFrame, robots: DataFrame, showedIn3Days: DataFrame,
      stateDate: String, seed: Long): DataFrame = {
    val candidates = boards.join(
      robots.filter(col("type") === "ROBOT" && col("status") === "ACTIVATE")
        .select("platform", "site_code", "player_name"),
      Seq("platform", "site_code"))
      .join(showedIn3Days.select((boardKeys.filterNot(_ == "site_code").map(col) :+ col("player_name")): _*)
        .dropDuplicates(),
        Seq("platform", "game_code", "room_type", "country", "player_name"), "left_anti")
    val w = Window.partitionBy(boardKeys.map(col): _*).orderBy(rand(seed), col("player_name"))
    candidates
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 20)
      .drop("rn")
      .withColumn("state_date", lit(stateDate).cast("date"))
      .withColumn("bet", lit(0.0))
      .withColumn("win", lit(0.0))
      .withColumn("is_bonus", lit(false))
      .withColumn("is_robot", lit(true))
  }

  /** A8: best real-player win per board today (player_ranking…py:221-240);
    * negatives and misses floor at 0. */
  def maxRealWin(playerDailyRanking: DataFrame, stateDate: String): DataFrame =
    playerDailyRanking
      .filter(col("state_date") === lit(stateDate).cast("date"))
      .filter(col("is_robot") === false)
      .groupBy(boardKeys.map(col): _*)
      .agg(greatest(max(col("win")), lit(0.0)).as("max_value"))

  case class BoardRow(
      platform: String, site_code: String, game_code: String, room_type: String,
      country: String, player_name: String, state_date: java.sql.Date,
      bet: Double, win: Double, is_bonus: Boolean, is_robot: Boolean,
      max_value: Double)

  /** The per-board betting simulation (player_ranking…py:160-215), seeded.
    * One group = one board: sample 5 robots for a normal round, then run
    * boost rounds until min(win) clears max_value, mirroring rolling_bet's
    * gauss/bernoulli arithmetic (x1000 scaling, 2% rake, 5x boost). */
  def simulate(boardsWithMax: DataFrame, seed: Long): DataFrame = {
    val spark = boardsWithMax.sparkSession
    import spark.implicits._
    val ds = boardsWithMax
      .withColumn("max_value", coalesce(col("max_value"), lit(0.0)))
      .as[BoardRow]

    ds.groupByKey(r => (r.platform, r.site_code, r.game_code, r.room_type, r.country))
      .flatMapGroups { (key: (String, String, String, String, String), it: Iterator[BoardRow]) =>
        val rows = it.toArray
        if (rows.isEmpty) Iterator.empty
        else {
          val rng = new scala.util.Random(seed ^ key.hashCode.toLong)
          val maxValue = rows.head.max_value
          var bet = rows.map(_.bet)
          var win = rows.map(_.win)

          def rollingBet(i: Int, winBoost: Boolean): Unit = {
            val gauss = math.abs((rng.nextGaussian() * 500 + 100).toInt)
            var k = 0
            while (k < 3) {
              val betting = gauss * 100
              if (winBoost) {
                win(i) += betting * 0.98 * 5 * 1000
                bet(i) += betting.toDouble * 5 * 1000
              } else {
                val threshold = math.abs((rng.nextGaussian() * 20 + 115).toInt)
                if (rng.nextInt(math.max(threshold, 1)) + 1 > 50) win(i) += betting * 0.98 * 1000
                bet(i) += betting.toDouble * 1000
              }
              k += 1
            }
          }

          // one normal round for 5 sampled robots
          rng.shuffle(rows.indices.toList).take(5).foreach(rollingBet(_, winBoost = false))
          // boost rounds until every robot clears the best real player
          var guard = 0
          while (win.min <= maxValue && guard < 100000) {
            rng.shuffle(rows.indices.toList).take(5).foreach(rollingBet(_, winBoost = true))
            guard += 1
          }

          rows.indices.iterator.map { i =>
            rows(i).copy(bet = bet(i), win = win(i))
          }
        }
      }
      .toDF()
      .drop("max_value")
  }

  /** W1+O2: re-rank — pandas rank(method='first', ascending=False) ==
    * row_number over win desc with arrival order as tiebreak; player_name
    * makes the tiebreak deterministic in a distributed setting. */
  def rank(boards: DataFrame): DataFrame = {
    val w = Window.partitionBy(boardKeys.map(col): _*)
      .orderBy(col("win").desc, col("player_name").asc)
    boards.withColumn("rank_no", row_number().over(w))
  }

  /** A9: bonus-flag count per board (player_ranking…py:305-315). */
  def bonusCount(boards: DataFrame): DataFrame =
    boards.groupBy(boardKeys.map(col): _*)
      .agg(sum(when(col("is_bonus"), 1).otherwise(0)).as("bonus_count"))

  /** O4+F11: the day-end bonus lottery (player_ranking…py:297-364): per
    * board, if no bonus was awarded yet, flag a seeded-random 3..8 rows
    * is_bonus=true; boards already awarded pass through unchanged (the
    * once-per-day guard). One window pass — no driver loop over boards. */
  def awardBonuses(yesterdayBoards: DataFrame, seed: Long,
      floorN: Int = 3, ceilN: Int = 8): DataFrame = {
    val w = Window.partitionBy(boardKeys.map(col): _*)
    val order = Window.partitionBy(boardKeys.map(col): _*)
      .orderBy(rand(seed), col("player_name"))
    // per-board deterministic winner count in [floorN, ceilN]
    val nWinners = (pmod(hash(boardKeys.map(col) :+ lit(seed): _*), lit(ceilN - floorN + 1))
      + floorN)
    yesterdayBoards
      .withColumn("_already", max(when(col("is_bonus"), 1).otherwise(0)).over(w))
      .withColumn("_pick", row_number().over(order))
      .withColumn("is_bonus",
        when(col("_already") === 1, col("is_bonus"))
          .otherwise(col("_pick") <= nWinners))
      .drop("_already", "_pick")
  }
}
