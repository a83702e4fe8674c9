package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** TopKPairs (TypedImperativeAggregate): equality with the window
  * formulation on random data under FORCED partial aggregation (many input
  * partitions -> map-side combine + serialized merge), tie determinism,
  * short groups, null handling, and SQL registration. */
class AggFunctionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def flat(df: org.apache.spark.sql.DataFrame) = df
    .select(col("g"), explode(col("top")).as("t"))
    .select(col("g"), col("t.score"), col("t.item"))
    .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  test("equals the window-sort formulation under forced partial aggregation") {
    val rnd = new scala.util.Random(41)
    val rows = (1 to 5000).map(i => ("g" + rnd.nextInt(7), rnd.nextInt(50).toLong, i.toLong))
    // 64 partitions over ~714 rows/group forces many partial buffers/merges
    val df = rows.toDF("g", "s", "i").repartition(64)
    val got = flat(df.groupBy("g")
      .agg(AggFunctions.topk_pairs(col("s"), col("i"), 5).as("top")))
    val w = Window.partitionBy("g").orderBy(col("s").desc, col("i").asc)
    val want = rows.toDF("g", "s", "i")
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select("g", "s", "i")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === want)
  }

  test("groups smaller than k, ties to the smaller item, nulls skipped") {
    val df = Seq(
      ("a", Some(10L), 1L), ("a", Some(10L), 2L), // tie -> both, order by item
      ("b", Some(5L), 3L),                        // short group
      ("b", None, 4L)                             // null score ignored
    ).toDF("g", "s", "i")
    val got = df.groupBy("g")
      .agg(AggFunctions.topk_pairs(col("s"), col("i"), 3).as("top"))
      .select(col("g"), col("top"))
      .collect().map(r => r.getString(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(x => (x.getLong(0), x.getLong(1)))).toMap
    assert(got("a") === Seq((10L, 1L), (10L, 2L))) // winner first, tie by item asc
    assert(got("b") === Seq((5L, 3L)))
  }

  test("streaming restart: the typed buffer deserializes from the checkpoint and keeps merging") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = java.nio.file.Files.createTempDirectory("graft_topk_ckpt").toString
    val in = s"$dir/in"; val ckpt = s"$dir/ckpt"
    def run(table: String): Unit = {
      val schema = spark.read.parquet(in).schema
      val q = spark.readStream.schema(schema).parquet(in)
        .groupBy("g").agg(AggFunctions.topk_pairs(col("s"), col("i"), 2).as("top"))
        .writeStream.outputMode("complete").format("memory").queryName(table)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000))
    }
    // run 1: the eventual winners are NOT yet present
    Seq(("a", 10L, 1L), ("a", 20L, 2L)).toDF("g", "s", "i").write.parquet(in)
    run("topk_r1")
    // run 2 (fresh query, same checkpoint): recovery must DESERIALIZE run 1's
    // buffer and merge the new rows into it
    Seq(("a", 30L, 3L), ("a", 15L, 4L)).toDF("g", "s", "i")
      .write.mode("append").parquet(in)
    run("topk_r2")
    val top = spark.table("topk_r2").select(explode(col("top"))).collect()
      .map(r => (r.getStruct(0).getLong(0), r.getStruct(0).getLong(1))).toSet
    assert(top === Set((30L, 3L), (20L, 2L)), "top-2 must span both runs' rows")
  }

  test("registered in SQL as topk_pairs") {
    GraftFunctions.registerAll(spark)
    Seq(("a", 1L, 10L), ("a", 2L, 20L)).toDF("g", "s", "i")
      .createOrReplaceTempView("topk_in")
    val out = spark.sql(
      "SELECT g, topk_pairs(s, i, 1) AS top FROM topk_in GROUP BY g")
      .select(explode(col("top"))).collect()
    assert(out.length === 1 && out(0).getStruct(0).getLong(0) === 2L)
  }

  test("kmv_distinct: exact below k, estimator above, invariant to partitioning and duplication") {
    import graft.functions.HashFunctions.md5_lo64
    def h = shiftrightunsigned(md5_lo64(col("v").cast("string")), 1)
    // below k: the sketch IS the exact distinct count
    val small = (1 to 40).map(i => ("g", i.toLong)).toDF("g", "v")
    val got = small.groupBy("g").agg(AggFunctions.kmv_distinct(h, 64).as("d"))
      .head.getDouble(1)
    assert(got === 40.0)
    // above k: estimate within 25% of truth for 2000 distinct values at k=64
    val big = (1 to 2000).map(i => ("g", i.toLong)).toDF("g", "v")
    val est = big.groupBy("g").agg(AggFunctions.kmv_distinct(h, 64).as("d"))
      .head.getDouble(1)
    assert(math.abs(est / 2000.0 - 1.0) < 0.25, s"estimate $est too far from 2000")
    // pure function of the value SET: duplicating rows and re-partitioning
    // (different partial/merge orders) must not move a single bit
    val dup = big.unionAll(big).unionAll(big.limit(500))
    for (p <- Seq(1, 7, 64)) {
      val e2 = dup.repartition(p).groupBy("g")
        .agg(AggFunctions.kmv_distinct(h, 64).as("d")).head.getDouble(1)
      assert(e2 === est, s"partitioning $p changed the sketch")
    }
  }
}
