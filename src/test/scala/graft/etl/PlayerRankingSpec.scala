package graft.etl

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PlayerRankingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val boards = PlayerRanking.explodeConfig(spark, "P0",
    siteCodes = Seq("S0"), gameCodes = Seq("g0"), roomTypes = Seq("ou"),
    countries = Seq("VND2"))

  private lazy val robots = (1 to 40).map(i =>
    (s"bot$i", "P0", "S0", "ROBOT", "ACTIVATE"))
    .toDF("player_name", "platform", "site_code", "type", "status")

  test("config explode produces the full cross product (F12)") {
    val multi = PlayerRanking.explodeConfig(spark, "P0",
      Seq("S0", "S1"), Seq("g0", "g1", "g2"), Seq("ou"), Seq("VND2", "THB"))
    assert(multi.count() === 2 * 3 * 1 * 2)
  }

  test("initBoards: 20 robots per board, excluding recently-shown, deterministic (P8+O4)") {
    val shown = Seq(("P0", "g0", "ou", "VND2", "bot1"), ("P0", "g0", "ou", "VND2", "bot2"))
      .toDF("platform", "game_code", "room_type", "country", "player_name")
    val b1 = PlayerRanking.initBoards(boards, robots, shown, "2024-01-10", seed = 7L).cache()
    assert(b1.count() === 20)
    assert(b1.filter(col("player_name").isin("bot1", "bot2")).isEmpty)
    assert(b1.filter(col("bet") =!= 0.0 || col("win") =!= 0.0).isEmpty)
    // deterministic under the same seed; different under another
    val b2 = PlayerRanking.initBoards(boards, robots, shown, "2024-01-10", seed = 7L)
    assert(b1.select("player_name").collect().map(_.getString(0)).sorted
      .sameElements(b2.select("player_name").collect().map(_.getString(0)).sorted))
    b1.unpersist()
  }

  test("maxRealWin floors negatives/misses at zero (A8)") {
    val pdr = Seq(
      ("P0", "S0", "g0", "ou", "VND2", java.sql.Date.valueOf("2024-01-10"), -500.0, false),
      ("P0", "S0", "g0", "ou", "VND2", java.sql.Date.valueOf("2024-01-10"), 90000.0, true)) // robot row ignored
      .toDF("platform", "site_code", "game_code", "room_type", "country", "state_date", "win", "is_robot")
    val mv = PlayerRanking.maxRealWin(pdr, "2024-01-10")
    assert(mv.head.getAs[Double]("max_value") === 0.0)
  }

  test("simulate pushes every robot above the best real player, deterministically") {
    val shown = Seq.empty[(String, String, String, String, String)]
      .toDF("platform", "game_code", "room_type", "country", "player_name")
    val init = PlayerRanking.initBoards(boards, robots, shown, "2024-01-10", seed = 7L)
    val withMax = init.withColumn("max_value", lit(50000.0))
    val sim1 = PlayerRanking.simulate(withMax, seed = 13L).cache()
    assert(sim1.count() === 20)
    assert(sim1.agg(min("win")).head.getDouble(0) > 50000.0,
      "boost loop must push all robots above the real max")
    val sim2 = PlayerRanking.simulate(withMax, seed = 13L)
    val d = sim1.alias("a").join(sim2.alias("b"), Seq("player_name"))
      .filter(col("a.win") =!= col("b.win") || col("a.bet") =!= col("b.bet"))
    assert(d.isEmpty, "simulation must be deterministic for a fixed seed")
    sim1.unpersist()
  }

  test("bonus lottery awards 3..8 once per board, idempotent when already awarded") {
    val shown = Seq.empty[(String, String, String, String, String)]
      .toDF("platform", "game_code", "room_type", "country", "player_name")
    val board = PlayerRanking.initBoards(boards, robots, shown, "2024-01-10", seed = 7L)
    val awarded = PlayerRanking.awardBonuses(board, seed = 99L).cache()
    val n = PlayerRanking.bonusCount(awarded).head.getAs[Long]("bonus_count")
    assert(n >= 3 && n <= 8, s"awarded $n, expected 3..8")
    // deterministic
    val again = PlayerRanking.awardBonuses(board, seed = 99L)
    assert(PlayerRanking.bonusCount(again).head.getAs[Long]("bonus_count") === n)
    // once-per-day guard: awarding an already-awarded board changes nothing
    val twice = PlayerRanking.awardBonuses(awarded, seed = 123L)
    val sameWinners = awarded.filter(col("is_bonus")).select("player_name").collect().map(_.getString(0)).toSet ===
      twice.filter(col("is_bonus")).select("player_name").collect().map(_.getString(0)).toSet
    assert(sameWinners, "re-award must not change winners")
    awarded.unpersist()
  }

  test("rank is dense 1..20 with win-desc order (W1) and bonusCount counts flags (A9)") {
    val shown = Seq.empty[(String, String, String, String, String)]
      .toDF("platform", "game_code", "room_type", "country", "player_name")
    val init = PlayerRanking.initBoards(boards, robots, shown, "2024-01-10", seed = 7L)
    val sim = PlayerRanking.simulate(init.withColumn("max_value", lit(1000.0)), seed = 13L)
    val ranked = PlayerRanking.rank(sim).cache()
    assert(ranked.agg(min("rank_no"), max("rank_no"), count(lit(1))).head ===
      org.apache.spark.sql.Row(1, 20, 20L))
    // ordering property: rank 1 has the max win
    val top = ranked.filter(col("rank_no") === 1).head.getAs[Double]("win")
    assert(top === ranked.agg(max("win")).head.getDouble(0))
    assert(PlayerRanking.bonusCount(ranked).head.getAs[Long]("bonus_count") === 0L)
    ranked.unpersist()
  }
}
