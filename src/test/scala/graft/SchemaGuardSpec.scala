package graft

import org.scalatest.funsuite.AnyFunSuite

class SchemaGuardSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("all engine schema assumptions hold on the driver fixtures") {
    SchemaGuard.check(spark, "/root/testdata/sf0.001")
  }

  test("a drifted column fails by NAME, not as a mid-query analysis error") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-guard").toString
    // events with ts as STRING — the third encoding nobody wrote a branch for
    Seq((1L, "2024-01-01 00:00:00", 10L, "view", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val vs = SchemaGuard.violations(spark, tmp)
    val tsDrift = vs.find(v => v.table == "events" && v.column == "ts")
    assert(tsDrift.isDefined, s"ts drift not reported: $vs")
    assert(tsDrift.get.detail.contains("StringType"), tsDrift.get.toString)
    // every other table is reported missing, also by name
    assert(vs.exists(v => v.table == "lineitem" && v.column == "*"))
    val err = intercept[IllegalStateException](SchemaGuard.check(spark, tmp))
    assert(err.getMessage.contains("events.ts"), err.getMessage)
  }
}
