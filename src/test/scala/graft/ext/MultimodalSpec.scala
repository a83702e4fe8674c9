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

  test("audio segmentation covers the payload exactly in duration-derived chunks") {
    val segs = Multimodal.segmentAudio(media, segMs = 1000).cache()
    assert(segs.select(countDistinct("media_id")).head.getLong(0) ===
      media.filter(col("kind") === "audio" && length(col("payload")) > 0).count())
    // segment count per clip = ceil(duration_ms / 1000)
    val badCount = segs.groupBy("media_id").agg(count(lit(1)).as("n"))
      .join(media.select(col("media_id"), col("duration_ms")), "media_id")
      .filter(col("n") =!= greatest(lit(1L), ceil(col("duration_ms") / 1000.0).cast("long")))
    assert(badCount.isEmpty)
    // concatenating the segments in order reconstructs the payload bitwise
    val rebuilt = segs.groupBy("media_id")
      .agg(array_sort(collect_list(struct(col("seg_index"), col("payload")))).as("parts"))
      .select(col("media_id"),
        expr("aggregate(parts, cast('' as binary), (acc, p) -> concat(acc, p.payload))").as("joined"))
    val mismatch = rebuilt.join(media, "media_id")
      .filter(col("joined") =!= col("payload"))
    assert(mismatch.isEmpty)
    segs.unpersist()
  }

  test("frame sampling explodes videos into frame rows") {
    val frames = Multimodal.sampleVideoFrames(media, 4)
    val videos = media.filter(col("kind") === "video").count()
    assert(frames.count() === videos * 4)
    assert(frames.select("kind").distinct().head.getString(0) === "image")
  }
}
