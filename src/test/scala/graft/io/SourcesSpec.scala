package graft.io

import graft.SparkTestSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class SourcesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("score", DoubleType)))

  test("jsonl split: good rows keep the declared schema, malformed lines quarantine verbatim") {
    val dir = java.nio.file.Files.createTempDirectory("graft_src").toString
    val lines = Seq(
      """{"id": 1, "name": "a", "score": 0.5}""",
      """{"id": 2, "name": "b"}""",              // missing field -> null, NOT corrupt
      """{"id": "not-a-number", "name": "c", "score": 1.0}""", // type clash -> corrupt
      """this is not json at all""",
      """{"id": 4, "name": "d", "score": 2.0}""")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "drop.jsonl"),
      lines.mkString("\n").getBytes)

    val (good, bad) = Sources.jsonl(spark, dir, schema)
    assert(good.columns.toSeq === Seq("id", "name", "score"))
    val ids = good.collect().map(r => if (r.isNullAt(0)) -1L else r.getLong(0)).sorted
    assert(ids === Array(1L, 2L, 4L))
    val raws = bad.collect().map(_.getString(0))
    assert(raws.length === 2)
    assert(raws.exists(_.contains("not-a-number")), "corrupt line not verbatim")
    assert(raws.contains("this is not json at all"))
  }

  test("csv split: ragged and type-broken rows quarantine, clean rows parse") {
    val dir = java.nio.file.Files.createTempDirectory("graft_src_csv").toString
    val lines = Seq(
      "id,name,score",
      "1,a,0.5",
      "2,b,oops",     // double column broken -> corrupt
      "3,c,1.25")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "drop.csv"),
      lines.mkString("\n").getBytes)

    val (good, bad) = Sources.csv(spark, dir, schema)
    assert(good.collect().map(_.getLong(0)).sorted === Array(1L, 3L))
    val raws = bad.collect().map(_.getString(0))
    assert(raws.length === 1 && raws.head.startsWith("2,b"))
  }

  test("ORC round-trip: schema-declared read, pushdown reaches the scan") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString
    val df = (1L to 1000L).map(i => (i, s"u$i", i * 1.5)).toDF("id", "name", "v")
    df.write.orc(s"$dir/t")
    val back = Sources.orc(spark, s"$dir/t", df.schema)
    assert(back.count() === 1000)
    val filtered = back.filter($"id" === 7L).select("name")
    assert(filtered.collect().map(_.getString(0)).toSeq === Seq("u7"))
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(id,7)"),
      s"ORC scan must receive the pushed filter:\n$plan")
  }
}
