package graft.ops

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("banded pairs equal the brute-force range join, incl. bucket-boundary rows") {
    val rnd = new scala.util.Random(11)
    val l = (1 to 150).map(i => ("k" + rnd.nextInt(4), ts(f"2024-01-01 ${10 + rnd.nextInt(2)}%02d:${rnd.nextInt(60)}%02d:${rnd.nextInt(60)}%02d"), i.toLong))
    // include exact boundary times: t - lookback (excluded? included: >=) and t (excluded: <)
    val lb = 600L
    val r = (1 to 250).map(i => ("k" + rnd.nextInt(4), ts(f"2024-01-01 ${10 + rnd.nextInt(2)}%02d:${rnd.nextInt(60)}%02d:${rnd.nextInt(60)}%02d"), i.toLong)) ++
      l.take(10).map { case (k, t, id) => (k, new java.sql.Timestamp(t.getTime - lb * 1000), 1000L + id) } ++ // == left - lookback: eligible
      l.take(10).map { case (k, t, id) => (k, t, 2000L + id) } // == left time: NOT eligible
    val lDf = l.toDF("k", "lt", "lid")
    val rDf = r.toDF("k", "rt", "rid")
    val got = RangeJoin.precedingPairs(lDf, rDf, Seq("k"), "lt", "rt", lb, Seq("rid"))
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val want = (for {
      (lk, lt, lid) <- l
      (rk, rt, rid) <- r
      if lk == rk && rt.getTime >= lt.getTime - lb * 1000 && rt.getTime < lt.getTime
    } yield (lid, rid)).toSet
    assert(got === want)
    assert(got.size === got.toSeq.size) // no duplicate pairs from bucket replication
  }

  test("plan is a hash equi-join on (keys, bucket), not a nested loop") {
    val lDf = Seq(("a", ts("2024-01-01 10:00:00"), 1L)).toDF("k", "lt", "lid")
    val rDf = Seq(("a", ts("2024-01-01 09:55:00"), 2L)).toDF("k", "rt", "rid")
    val plan = RangeJoin.precedingPairs(lDf, rDf, Seq("k"), "lt", "rt", 600, Seq("rid"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
  }
}
