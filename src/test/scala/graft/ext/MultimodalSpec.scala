package graft.ext

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  lazy val media = Multimodal.syntheticMedia(spark, Tables.documents(spark, sf)).cache()

  test("decode produces fixed-dim deterministic features; identical bytes match") {
    val f1 = Multimodal.decodeFeatures(media).cache()
    assert(f1.filter(!col("decode_ok")).isEmpty)
    assert(f1.filter(col("feature_dim") =!= 64 || size(col("feature")) =!= 64).isEmpty)
    // determinism across runs
    val f2 = Multimodal.decodeFeatures(media)
    val diff = f1.alias("a").join(f2.alias("b"), "media_id")
      .filter(col("a.feature") =!= col("b.feature"))
    assert(diff.isEmpty)
    // identical payloads -> identical features (dedup-over-media works)
    val dup = media.limit(1).withColumn("media_id", lit(999999L))
    val f3 = Multimodal.decodeFeatures(media.limit(1).unionByName(dup))
    assert(f3.select("feature").distinct().count() === 1)
    f1.unpersist()
  }

  test("media budget never needs the payload column (metadata-only plan)") {
    val budget = Multimodal.mediaBudget(media)
    assert(budget.count() === 3) // image/audio/video
    val total = budget.agg(sum("n")).head.getLong(0)
    assert(total === media.count())
  }

  test("resize keeps only images and stamps new dimensions") {
    val resized = Multimodal.resizeImages(media, 32, 32)
    assert(resized.select("kind").distinct().head.getString(0) === "image")
    assert(resized.filter(col("width") =!= 32 || col("height") =!= 32).isEmpty)
  }

  test("frame sampling explodes videos into frame rows") {
    val frames = Multimodal.sampleVideoFrames(media, 4)
    val videos = media.filter(col("kind") === "video").count()
    assert(frames.count() === videos * 4)
    assert(frames.select("kind").distinct().head.getString(0) === "image")
  }
}
