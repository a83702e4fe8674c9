package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Checkpoint-recovery / exactly-once proof for the streaming 5-min tier:
  * stop the query mid-input, restart it from the same checkpoint, and the
  * report table must equal the batch aggregation over ALL input — including
  * the case partition-granular overwrite gets wrong (a late row that updates
  * ONE group of an already-written slice must not wipe the slice's other
  * groups), and a restart with no new data must change nothing. */
class StreamRecoverySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def vrow(player: String, t: String, v: Double) =
    ("P0", "S0", player, "C0", "IN", BigDecimal(v), BigDecimal(v * 2),
      BigDecimal(v * 0.9), "SUCCESS", ts(t))

  private def toVlog(rows: Seq[(String, String, String, String, String,
      BigDecimal, BigDecimal, BigDecimal, String, java.sql.Timestamp)]): DataFrame =
    rows.toDF("platform", "site_code", "player_name", "country", "trade_type",
      "value", "before_value", "after_value", "trade_status", "trade_time")

  private def runUntilDrained(in: String, table: String, ckpt: String): Unit = {
    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema).parquet(in)
    val q = StreamingSummary.startTransFiveMin(stream, table, ckpt)
    try q.processAllAvailable() finally q.stop()
  }

  test("stop/restart from checkpoint: late partial-group update survives, no loss, no dupes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_recover").toString
    val in = s"$dir/in"; val table = s"$dir/table"; val ckpt = s"$dir/ckpt"

    // Run 1: slice 10:00 has TWO groups (alice, bob).
    toVlog(Seq(
      vrow("alice", "2024-01-01 10:01:00", 10.0),
      vrow("bob", "2024-01-01 10:02:00", 20.0),
      vrow("alice", "2024-01-01 10:03:00", 5.0)
    )).write.parquet(in)
    runUntilDrained(in, table, ckpt)

    val after1 = spark.read.parquet(table)
    assert(after1.count() === 2)
    assert(after1.filter($"player_name" === "alice")
      .head.getAs[java.math.BigDecimal]("trans_in_amount").doubleValue === 15.0)

    // Run 2 (fresh query object, SAME checkpoint): a late row updating ONLY
    // alice in the already-written 10:00 slice, plus a new 10:30 slice. The
    // update-mode batch emits alice and carol but NOT bob — bob must survive.
    toVlog(Seq(
      vrow("alice", "2024-01-01 10:04:00", 100.0),
      vrow("carol", "2024-01-01 10:31:00", 7.0)
    )).write.mode("append").parquet(in)
    runUntilDrained(in, table, ckpt)

    val after2 = spark.read.parquet(table)
    val byPlayer = after2.groupBy("player_name")
      .agg(sum($"trans_in_amount").as("amt"), sum($"trans_in_count").as("cnt"))
      .collect().map(r => r.getString(0) ->
        (r.getAs[java.math.BigDecimal]("amt").doubleValue, r.getAs[Long]("cnt"))).toMap
    assert(byPlayer("alice") === ((115.0, 3L)), "late row must fold into the existing group")
    assert(byPlayer("bob") === ((20.0, 1L)), "unchanged sibling group must survive the upsert")
    assert(byPlayer("carol") === ((7.0, 1L)), "post-restart slice must arrive")
    assert(after2.count() === 3, "one row per (slice, group) — no duplicates")

    // Run 3: restart with nothing new — a pure replay must be a no-op.
    runUntilDrained(in, table, ckpt)
    val after3 = spark.read.parquet(table)
    assert(after3.count() === 3)
    assert(after3.agg(sum("trans_in_amount")).head.getAs[java.math.BigDecimal](0)
      .doubleValue === 142.0)
  }

  test("RocksDB state store: the stateful stream runs on the spillable provider with identical output") {
    // At scale, streaming state (open windows, dedup keys, join buffers)
    // outgrows executor heap; RocksDB is the provider that spills. The
    // pipeline must produce the same bits on it as on the default in-memory
    // provider — provider choice is an ops knob, not a semantics knob.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val dir = java.nio.file.Files.createTempDirectory("graft_rocks").toString
      toVlog(Seq(
        vrow("alice", "2024-01-01 10:01:00", 10.0),
        vrow("bob", "2024-01-01 10:02:00", 20.0),
        vrow("alice", "2024-01-01 10:33:00", 5.0)
      )).write.parquet(s"$dir/in")
      runUntilDrained(s"$dir/in", s"$dir/table", s"$dir/ckpt")
      val got = spark.read.parquet(s"$dir/table")
        .groupBy("player_name").agg(sum($"trans_in_amount").as("amt"))
        .collect().map(r => r.getString(0) ->
          r.getAs[java.math.BigDecimal]("amt").doubleValue).toMap
      assert(got === Map("alice" -> 15.0, "bob" -> 20.0))
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("upsertSlices: NULL group keys upsert exactly like non-null ones (null-safe equality)") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert_null").toString
    val t = s"$dir/t"
    val schema = StructType(Seq(StructField("d", IntegerType),
      StructField("k", StringType), StructField("v", DoubleType)))
    def df(rows: Seq[(Int, String, Double)]) = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r =>
        org.apache.spark.sql.Row(r._1, r._2, r._3))), schema)
    graft.io.Sinks.upsertSlices(
      df(Seq((20240101, null, 1.0), (20240101, "b", 2.0))), t, Seq("d"), Seq("d", "k"))
    // re-emit the NULL-key group with a new value: must REPLACE, not duplicate
    graft.io.Sinks.upsertSlices(
      df(Seq((20240101, null, 9.0))), t, Seq("d"), Seq("d", "k"))
    val got = spark.read.parquet(t).select("k", "v").collect()
      .map(r => Option(r.getString(0)).getOrElse("<null>") -> r.getDouble(1)).toMap
    assert(got === Map("<null>" -> 9.0, "b" -> 2.0))
    assert(spark.read.parquet(t).count() === 2, "null-key group must not duplicate")
  }

  test("upsertSlices directly: replaces matched keys, keeps siblings, leaves other partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert").toString
    val t = s"$dir/t"
    val day1a = Seq((20240101, "a", 1.0), (20240101, "b", 2.0)).toDF("d", "k", "v")
    val day2 = Seq((20240102, "a", 9.0)).toDF("d", "k", "v")
    graft.io.Sinks.upsertSlices(day1a, t, Seq("d"), Seq("d", "k"))
    graft.io.Sinks.upsertSlices(day2, t, Seq("d"), Seq("d", "k"))
    // the touched-partition bound, at the FILE level: record day2's physical
    // files before upserting day1 — a merge that re-read or rewrote the
    // untouched partition (the 100 TB failure mode of read-merge-overwrite)
    // would replace these part files
    def partFiles(day: Int): Map[String, Long] = {
      val d = new java.io.File(s"$t/d=$day")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified).toMap
    }
    val day2Before = partFiles(20240102)
    assert(day2Before.nonEmpty)
    // update day1/a only; day1/b and day2 untouched
    graft.io.Sinks.upsertSlices(
      Seq((20240101, "a", 5.0)).toDF("d", "k", "v"), t, Seq("d"), Seq("d", "k"))
    val got = spark.read.parquet(t).collect()
      .map(r => (r.getAs[Int]("d"), r.getAs[String]("k")) -> r.getAs[Double]("v")).toMap
    assert(got === Map((20240101, "a") -> 5.0, (20240101, "b") -> 2.0,
      (20240102, "a") -> 9.0))
    assert(partFiles(20240102) === day2Before,
      "upsert rewrote files of a partition the batch never touched")
  }
}
