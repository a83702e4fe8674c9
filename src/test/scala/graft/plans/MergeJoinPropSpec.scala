package graft.plans

import graft.SparkTestSession
import graft.ops.{AsOfJoin, RangeJoin}
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Property grid for the native merge execs: across key cardinality (one
  * hot key -> many sparse keys), time-collision density (dense equal
  * timestamps -> spread), strictness, and window width, the native plans
  * must equal their compositional formulations row for row. Seeded samples,
  * grid-style like SlicerPropSpec. */
class MergeJoinPropSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(sec: Int) =
    java.sql.Timestamp.valueOf(java.time.LocalDateTime.of(2024, 1, 1, 10, 0).plusSeconds(sec))

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def mkSides(seed: Int, keyCard: Int, tsSpread: Int): (DataFrame, DataFrame) = {
    val rnd = new scala.util.Random(seed)
    val l = (1 to 120).map(i =>
      ("k" + rnd.nextInt(keyCard), ts(rnd.nextInt(tsSpread)), i.toLong))
      .toDF("k", "lt", "lid")
    val r = (1 to 200).map(i =>
      ("k" + rnd.nextInt(keyCard + 2), ts(rnd.nextInt(tsSpread)), i.toLong, rnd.nextDouble()))
      .toDF("k", "rt", "rid", "v")
    (l, r)
  }

  test("property: native as-of == union+window across cardinality, density, strictness") {
    for {
      keyCard <- Seq(1, 3, 20)
      tsSpread <- Seq(15, 3600) // 15s: heavy timestamp ties; 3600s: spread
      strict <- Seq(true, false)
    } {
      val (l, r) = mkSides(seed = 31 * keyCard + tsSpread, keyCard, tsSpread)
      val native = AsOfMergeJoin.asOfLeft(l, r, Seq("k"), "lt", "rt",
        Seq("rid", "rt", "v"), strict = strict, tieBreak = Seq("rid"))
      val window = AsOfJoin.asOfLeft(l, r, Seq("k"), "lt", "rt",
        Seq("rid", "rt", "v"), strict = strict, tieBreak = Seq("rid"))
      assert(sortedRows(native) === sortedRows(window),
        s"keyCard=$keyCard tsSpread=$tsSpread strict=$strict")
    }
  }

  test("property: native range == banded across cardinality, density, window width") {
    for {
      keyCard <- Seq(1, 5, 20)
      tsSpread <- Seq(15, 3600)
      lookback <- Seq(30L, 600L)
    } {
      val (l, r) = mkSides(seed = 17 * keyCard + tsSpread + lookback.toInt, keyCard, tsSpread)
      val native = RangeMergeJoin.precedingPairs(l, r, Seq("k"), "lt", "rt",
        lookback, payload = Seq("rid", "v"))
      val banded = RangeJoin.precedingPairs(l, r, Seq("k"), "lt", "rt",
        lookback, payload = Seq("rid", "v"))
      assert(sortedRows(native) === sortedRows(banded),
        s"keyCard=$keyCard tsSpread=$tsSpread lookback=$lookback")
    }
  }
}
