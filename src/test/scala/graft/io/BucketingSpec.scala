package graft.io

import graft.SparkTestSession
import graft.etl.TestData
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Proves the co-location claim: joining two tables bucketed on the same key
  * plans WITHOUT a shuffle exchange, while the same join over plain parquet
  * shuffles both sides. (Plans are adaptive: inspect the final plan string
  * after materialization; shuffles print as `Exchange hashpartitioning`.) */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
    df.count() // finalize the adaptive plan
    "Exchange hashpartitioning".r.findAllIn(df.queryExecution.executedPlan.toString).size
  }

  test("bucketed tier join is shuffle-free; plain-parquet join shuffles") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bucket").toString
    val vlog = TestData.valueLog(spark)
    val agg1 = vlog.groupBy("player_name").agg(sum("value").as("v1"))
    val agg2 = vlog.filter(col("trade_type") === "IN")
      .groupBy("player_name").agg(count(lit(1)).as("n2"))

    Sinks.writeBucketed(agg1, "graft_b1", Seq("player_name"), 4, Seq("player_name"))
    Sinks.writeBucketed(agg2, "graft_b2", Seq("player_name"), 4, Seq("player_name"))
    agg1.write.mode("overwrite").parquet(s"$dir/p1")
    agg2.write.mode("overwrite").parquet(s"$dir/p2")
    try {
      // broadcast would hide the comparison on tiny tables: force SMJ
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val bucketed = spark.table("graft_b1").join(spark.table("graft_b2"), "player_name")
      val plain = spark.read.parquet(s"$dir/p1").join(spark.read.parquet(s"$dir/p2"), "player_name")
      assert(shuffles(bucketed) === 0,
        s"bucketed join must not shuffle:\n${bucketed.queryExecution.executedPlan}")
      assert(shuffles(plain) > 0, "control: plain parquet join should shuffle")
      assert(bucketed.count() === plain.count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS graft_b1")
      spark.sql("DROP TABLE IF EXISTS graft_b2")
    }
  }
}
