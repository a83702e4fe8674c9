package graft.ext

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def items = ("a" * 50 + "b" * 30 + "c" * 15 + "d" * 5)
    .map(_.toString).toDF("item")

  test("cms estimate is overcount-only and exact when the table is collision-free") {
    // width 4096 >> 4 distinct items: collisions are (4 choose 2)*4/4096
    // unlikely per row and the min over 4 rows kills any single collision
    val hh = Sketch.cmsHeavyHitters(items, col("item"),
      depth = 4, width = 4096, thresholdDenom = 100)
      .as[(String, Long, Long)].collect().map { case (k, e, c) => k -> (e, c) }.toMap
    assert(hh.keySet == Set("a", "b", "c", "d"), s"all items clear 1%: $hh")
    hh.foreach { case (k, (est, exact)) =>
      assert(est == exact, s"$k: wide table must estimate exactly, got $est vs $exact")
    }
    assert(hh("a")._2 == 50 && hh("d")._2 == 5)
  }

  test("width-1 table collapses every estimate to the total (overcount bound)") {
    val hh = Sketch.cmsHeavyHitters(items, col("item"),
      depth = 4, width = 1, thresholdDenom = 100)
      .as[(String, Long, Long)].collect()
    assert(hh.length == 4)
    hh.foreach { case (k, est, exact) =>
      assert(est == 100L, s"$k: single bucket holds every occurrence")
      assert(est >= exact, "overcount-only")
    }
  }

  test("threshold gates: denom 3 keeps only items with >= total/3 occurrences") {
    val hh = Sketch.cmsHeavyHitters(items, col("item"),
      depth = 4, width = 4096, thresholdDenom = 3)
      .as[(String, Long, Long)].collect().map(_._1).toSet
    assert(hh == Set("a"), s"only 'a' (50 >= 33): $hh")
  }

  test("weighted build == occurrence build, bitwise, layout-invariant") {
    val occ = Sketch.cmsCounters(items.repartition(7), col("item"), 4, 64)
    val cnts = items.groupBy("item").agg(count(lit(1)).as("c"))
    val wtd = Sketch.cmsCountersWeighted(cnts.repartition(3), col("item"), col("c"), 4, 64)
    assert(occ.except(wtd).isEmpty && wtd.except(occ).isEmpty,
      "addition is associative: both builds yield the identical counter table")
  }
}
