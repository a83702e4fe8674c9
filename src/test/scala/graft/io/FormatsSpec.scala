package graft.io

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FormatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  val sf = "/root/testdata/sf0.001"

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("events slice round-trips bitwise through every supported format") {
    val base = graft.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts").cast("timestamp").as("ts"),
        col("value").cast("decimal(12,2)").as("amt"))
      .limit(500)
    val want = canon(base)
    val schema = base.schema
    val tmp = java.nio.file.Files.createTempDirectory("graft-formats").toString
    Formats.supported.foreach { fmt =>
      Formats.write(base, s"$tmp/$fmt", fmt)
      val got = canon(Formats.read(spark, s"$tmp/$fmt", fmt, schema))
      assert(got == want, s"$fmt round-trip must be bitwise (timestamps, decimals)")
    }
  }

  test("nested schemas round-trip through columnar formats; csv rejects them") {
    val nested = Seq((1L, Seq(1.5, 2.5), "x")).toDF("id", "vec", "tag")
    val tmp = java.nio.file.Files.createTempDirectory("graft-formats-n").toString
    Seq("parquet", "orc", "json").foreach { fmt =>
      Formats.write(nested, s"$tmp/$fmt", fmt)
      assert(canon(Formats.read(spark, s"$tmp/$fmt", fmt, nested.schema)) == canon(nested), fmt)
    }
    intercept[IllegalArgumentException] {
      Formats.write(nested, s"$tmp/csv", "csv")
    }
    intercept[IllegalArgumentException] {
      Formats.write(nested, s"$tmp/avro", "avro") // connector not shipped
    }
  }

  test("text formats read under the writer's schema, never inference") {
    val base = Seq((1L, "2024-01-01 10:30:00.123456")).toDF("id", "s")
      .select(col("id"), col("s").cast("timestamp").as("ts"))
    val tmp = java.nio.file.Files.createTempDirectory("graft-formats-t").toString
    Formats.write(base, s"$tmp/json", "json")
    val back = Formats.read(spark, s"$tmp/json", "json", base.schema)
    assert(back.schema("ts").dataType.typeName == "timestamp",
      "explicit schema must pin the type")
    assert(canon(back) == canon(base), "sub-second precision must survive the text round trip")
  }
}
