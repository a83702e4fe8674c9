package graft.plans

import graft.SparkTestSession
import graft.ops.RangeJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native range-merge exec must equal the banded (bucketed) formulation
  * row for row, honor the half-open [lt - W, lt) boundaries exactly, and
  * plan as a merge over two unexploded exchanges. */
class RangeMergeJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("boundary semantics: [lt - W, lt) half-open, per-key isolation") {
    val purchases = Seq(
      ("A", ts("2024-01-01 10:10:00"), 1L),
      ("B", ts("2024-01-01 10:10:00"), 2L)
    ).toDF("k", "pt", "pid")
    val views = Seq(
      ("A", ts("2024-01-01 10:00:00"), 10L), // == lt - W: included
      ("A", ts("2024-01-01 09:59:59"), 11L), // just before window: excluded
      ("A", ts("2024-01-01 10:09:59"), 12L), // just inside: included
      ("A", ts("2024-01-01 10:10:00"), 13L), // == lt: excluded (half-open)
      ("B", ts("2024-01-01 10:05:00"), 14L)
    ).toDF("k", "vt", "vid")
    val got = RangeMergeJoin.precedingPairs(purchases, views, Seq("k"),
      "pt", "vt", lookbackSec = 600, payload = Seq("vid"))
      .collect().map(r => (r.getAs[Long]("pid"), r.getAs[Long]("vid"))).toSet
    assert(got === Set((1L, 10L), (1L, 12L), (2L, 14L)))
  }

  test("equals the banded formulation on random data") {
    val rnd = new scala.util.Random(23)
    val l = (1 to 400).map(i => ("k" + rnd.nextInt(6),
      ts(f"2024-01-01 10:${rnd.nextInt(60)}%02d:${rnd.nextInt(60)}%02d"), i.toLong))
      .toDF("k", "lt", "lid")
    val r = (1 to 700).map(i => ("k" + rnd.nextInt(8),
      ts(f"2024-01-01 10:${rnd.nextInt(60)}%02d:${rnd.nextInt(60)}%02d"), i.toLong, rnd.nextDouble()))
      .toDF("k", "rt", "rid", "v")
    for (w <- Seq(60L, 290L, 600L)) {
      val native = RangeMergeJoin.precedingPairs(l, r, Seq("k"), "lt", "rt", w,
        payload = Seq("rid", "v"))
      val banded = RangeJoin.precedingPairs(l, r, Seq("k"), "lt", "rt", w,
        payload = Seq("rid", "v"))
      assert(sortedRows(native) === sortedRows(banded), s"lookback=$w")
    }
  }

  test("repeated left times and duplicate right times all pair") {
    val l = Seq(("A", ts("2024-01-01 10:10:00"), 1L),
      ("A", ts("2024-01-01 10:10:00"), 2L)).toDF("k", "lt", "lid")
    val r = Seq(("A", ts("2024-01-01 10:05:00"), 10L),
      ("A", ts("2024-01-01 10:05:00"), 11L)).toDF("k", "rt", "rid")
    val got = RangeMergeJoin.precedingPairs(l, r, Seq("k"), "lt", "rt", 600, Seq("rid"))
      .collect().map(x => (x.getAs[Long]("lid"), x.getAs[Long]("rid"))).toSet
    assert(got === Set((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L)))
  }

  test("plans as one merge exec over two unexploded exchanges — no Generate/explode") {
    val l = Seq(("A", ts("2024-01-01 10:10:00"), 1L)).toDF("k", "lt", "lid")
    val r = Seq(("A", ts("2024-01-01 10:05:00"), 10L)).toDF("k", "rt", "rid")
    val df = RangeMergeJoin.precedingPairs(l, r, Seq("k"), "lt", "rt", 600, Seq("rid"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("RangeMergeJoin"), plan)
    assert(!plan.contains("Generate"), s"left side must not be exploded:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 2, plan)
  }

  test("pushdown rule: unused left columns pruned into the parquet ReadSchema") {
    val dir = java.nio.file.Files.createTempDirectory("graft_range_prune").toString
    Seq(("A", ts("2024-01-01 10:10:00"), 1L, "wide", 9.9))
      .toDF("k", "lt", "lid", "fat_a", "fat_b")
      .write.mode("overwrite").parquet(s"$dir/l")
    val l = spark.read.parquet(s"$dir/l")
    val r = Seq(("A", ts("2024-01-01 10:05:00"), 10L)).toDF("k", "rt", "rid")
    val df = RangeMergeJoin.precedingPairs(l, r, Seq("k"), "lt", "rt", 600, Seq("rid"))
      .select("lid", "rid")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("fat_a") && !plan.contains("fat_b"),
      s"unused left columns must not reach the scan:\n$plan")
    assert(df.collect().map(x => (x.getLong(0), x.getLong(1))).toSet === Set((1L, 10L)))
  }

  test("null left times match nothing; empty right side yields empty output") {
    val l = Seq(("A", Option(ts("2024-01-01 10:10:00")), 1L),
      ("A", Option.empty[java.sql.Timestamp], 2L)).toDF("k", "lt", "lid")
    val r = Seq(("A", Option(ts("2024-01-01 10:05:00")), 10L),
      ("A", Option.empty[java.sql.Timestamp], 11L)).toDF("k", "rt", "rid")
    val got = RangeMergeJoin.precedingPairs(l, r, Seq("k"), "lt", "rt", 600, Seq("rid"))
      .collect().map(x => (x.getAs[Long]("lid"), x.getAs[Long]("rid"))).toSet
    assert(got === Set((1L, 10L)))
    assert(RangeMergeJoin.precedingPairs(
      l, r.filter($"k" === "none"), Seq("k"), "lt", "rt", 600, Seq("rid")).count() === 0)
  }
}
