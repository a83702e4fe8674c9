package graft.orchestrate

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ProcessPipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import ProcessPipeline._

  test("pipeline threads data through steps and returns the final frame") {
    val result = ProcessPipeline.run(spark, "producer", Seq(
      step("scan") { (_, s) => Some(s.range(10).toDF("id")) },
      step("filter") { (d, _) => d.map(_.filter(col("id") < 5)) },
      step("tag") { (d, _) => d.map(_.withColumn("ok", lit(true))) }))
    assert(result.isRight)
    assert(result.toOption.get.get.count() === 5)
  }

  test("a failing step retries, records the error, notifies, and halts") {
    val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
    val notified = new java.util.concurrent.atomic.AtomicInteger(0)
    val errPath = java.nio.file.Files.createTempDirectory("graft_err").toString + "/error_log"
    val notifier = new Notifier {
      override def send(title: String, e: PipelineError): Unit = notified.incrementAndGet()
    }
    val result = ProcessPipeline.run(spark, "producer", Seq(
      step("scan") { (_, s) => Some(s.range(3).toDF("id")) },
      step("boom") { (_, _) => attempts.incrementAndGet(); sys.error("db down") },
      step("never") { (d, _) => fail("step after failure must not run"); d }),
      errorLogPath = Some(errPath), notifier = notifier, tries = 3, delayMs = 1,
      clock = () => java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))

    assert(result.isLeft)
    assert(attempts.get() === 3, "step must retry `tries` times")
    assert(notified.get() === 1)
    val log = spark.read.parquet(errPath)
    assert(log.count() === 1)
    val row = log.head
    assert(row.getAs[String]("process") === "boom")
    assert(row.getAs[String]("content").contains("db down"))
  }

  test("file notifier appends the reference-shaped alert payload and the pipeline halts") {
    val alertFile = java.nio.file.Files.createTempDirectory("graft_alerts")
      .resolve("alerts.log").toString
    val result = ProcessPipeline.run(spark, "trans_summary", Seq(
      step("ReadSlice") { (_, s) => Some(s.range(3).toDF("id")) },
      step("WriteSlice") { (_, _) => sys.error("connection refused") }),
      notifier = new FileNotifier(alertFile), tries = 2, delayMs = 1,
      clock = () => java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
    assert(result.isLeft)
    val payload = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(alertFile)), "UTF-8")
    // the exact field block the reference's transport sends (TGMessage.py)
    assert(payload.startsWith("***** trans_summary Error *****\n"))
    assert(payload.contains("pipeline: trans_summary\n"))
    assert(payload.contains("process: WriteSlice\n"))
    assert(payload.contains("content: java.lang.RuntimeException: connection refused"))
    assert(payload.contains("time: 2024-01-01 00:00:00"))
    // a second failure APPENDS (the error ledger semantics), never truncates
    ProcessPipeline.run(spark, "trans_summary", Seq(
      step("WriteSlice") { (_, _) => sys.error("still down") }),
      notifier = new FileNotifier(alertFile), tries = 1, delayMs = 1,
      clock = () => java.sql.Timestamp.valueOf("2024-01-01 00:05:00"))
    val twice = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(alertFile)), "UTF-8")
    // each alert header carries two 5-star runs -> 2 alerts = 4 runs
    assert("\\*{5}".r.findAllIn(twice).size === 4,
      "two alerts must both be present")
  }

  test("heartbeat fires at most once per interval") {
    val beats = scala.collection.mutable.ArrayBuffer.empty[String]
    val hb = new Heartbeat("producer", intervalMinutes = 60, send = beats += _)
    val base = 1700000000000L
    assert(hb.tick(base))                       // first tick fires
    assert(!hb.tick(base + 30 * 60000L))        // 30 min later: silent
    assert(hb.tick(base + 61 * 60000L))         // past the hour: fires
    assert(beats.size === 2)
  }

  test("dep gate bypass: 5min and pass-listed assignees flow through matched") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val tasks = Seq(
      ("ALL", "ALL", "ALL", "t5", "5min", ts("2024-01-01 10:00:00"), ts("2024-01-01 10:05:00")),
      ("ALL", "ALL", "ALL", "skip_me", "1H", ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
      ("ALL", "ALL", "ALL", "gated", "1H", ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")))
      .toDF("platform", "site_code", "game_code", "assignee", "freq_type", "gte_time", "lt_time")
    val board = Seq(
      ("ALL", "ALL", "ALL", "gated", "x", "5min", ts("2024-01-01 10:00:00"), ts("2024-01-01 10:05:00"), 1))
      .toDF("platform", "site_code", "game_code", "assignee", "report_class", "freq_type", "gte_time", "lt_time", "done")
    val gated = TaskLedger.gateWithBypass(tasks, board, passDepCheck = Set("skip_me"))
    val byAssignee = gated.collect().map(r => r.getAs[String]("assignee") -> r.getAs[Int]("matched")).toMap
    assert(byAssignee("t5") === 1)
    assert(byAssignee("skip_me") === 1)
    assert(byAssignee("gated") === 0) // only 1 of 12 5min slices done
  }
}
