package graft.time

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the slicer (SURVEY §5.3): slices tile `[gte, lt)`
  * exactly — no overlap, no gap, total span preserved — and floor/ceil are
  * idempotent projections. Samples are seeded-pseudo-random and checked
  * column-wise in one Spark pass per property (not one job per sample).
  */
class SlicerPropSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val base = java.time.LocalDateTime.of(2024, 1, 1, 0, 0)

  test("property: fixed-freq slices tile the aligned range exactly") {
    val cases = for {
      freq <- Seq("5min", "1H", "1D")
      startUnits <- Seq(0L, 3L, 17L)
      n <- Seq(1L, 7L, 48L)
    } yield {
      val unitMin = freq match { case "5min" => 5L; case "1H" => 60L; case "1D" => 1440L }
      val gte = base.plusMinutes(startUnits * unitMin)
      val lt = gte.plusMinutes(n * unitMin)
      (s"$freq/$startUnits/$n", freq, java.sql.Timestamp.valueOf(gte), java.sql.Timestamp.valueOf(lt), n)
    }
    val tasks = cases.map { case (id, f, g, l, _) => (id, f, g, l) }
      .toDF("case_id", "freq_type", "gte_time", "lt_time")
    val sliced = Slicer.explodeSlices(tasks)

    // count per case == n
    val counts = sliced.groupBy("case_id").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    cases.foreach { case (id, _, _, _, n) => assert(counts(id) === n, s"case $id") }

    // tiling: min gte == range gte, max lt == range lt, sum of widths == span
    val agg = sliced
      .withColumn("width", unix_timestamp(col("lt_time")) - unix_timestamp(col("gte_time")))
      .groupBy("case_id")
      .agg(min("gte_time").as("mn"), max("lt_time").as("mx"), sum("width").as("w"))
      .collect().map(r => r.getString(0) -> r).toMap
    cases.foreach { case (id, _, g, l, _) =>
      val r = agg(id)
      assert(r.getAs[java.sql.Timestamp]("mn") === g, s"case $id min")
      assert(r.getAs[java.sql.Timestamp]("mx") === l, s"case $id max")
      assert(r.getAs[Long]("w") === (l.getTime - g.getTime) / 1000, s"case $id width: gap or overlap")
    }
  }

  test("property: floor/ceil are idempotent, ordered, and boundary-stable") {
    val rng = new scala.util.Random(42)
    val samples = (1 to 200).map { _ =>
      // mix of arbitrary instants and exact boundaries
      val m = rng.nextInt(400 * 24 * 60).toLong
      val minutes = if (rng.nextBoolean()) m - m % 60 else m
      java.sql.Timestamp.valueOf(base.plusMinutes(minutes))
    }
    for (freq <- Seq("5min", "1H", "1D", "1M")) {
      val df = samples.map(Tuple1(_)).toDF("ts").select(
        col("ts"),
        Slicer.floorTo(col("ts"), freq).as("f"),
        Slicer.ceilTo(col("ts"), freq).as("c"),
        Slicer.floorTo(Slicer.floorTo(col("ts"), freq), freq).as("ff"),
        Slicer.ceilTo(Slicer.ceilTo(col("ts"), freq), freq).as("cc"))
      val bad = df.filter(
        col("f") > col("ts") || col("c") < col("ts") ||
          col("ff") =!= col("f") || col("cc") =!= col("c") ||
          (col("f") === col("ts") && col("c") =!= col("ts")))
      assert(bad.isEmpty, s"freq $freq violated floor/ceil invariants: ${bad.head(3).mkString}")
    }
  }

  test("property: every emitted slice is whole (lt - gte == one unit) for fixed freqs") {
    val tasks = (0 until 20).map { i =>
      (s"t$i", Seq("5min", "1H", "1D")(i % 3),
        java.sql.Timestamp.valueOf(base.plusMinutes(i * 37L)),
        java.sql.Timestamp.valueOf(base.plusMinutes(i * 37L + 2000L)))
    }.toDF("case_id", "freq_type", "gte_time", "lt_time")
    val bad = Slicer.explodeSlices(tasks)
      .withColumn("width_s", unix_timestamp(col("lt_time")) - unix_timestamp(col("gte_time")))
      .withColumn("expect_s",
        when(col("freq_type") === "5min", 300L)
          .when(col("freq_type") === "1H", 3600L)
          .otherwise(86400L))
      .filter(col("width_s") =!= col("expect_s"))
    assert(bad.isEmpty)
  }
}
