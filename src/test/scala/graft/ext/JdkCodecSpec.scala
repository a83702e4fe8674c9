package graft.ext

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import graft.SparkTestSession
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The JDK-backed real codec under the same stage plumbing the FakeCodec
  * gate queries run: real PNG decode/resize, real WAV parse/segmentation,
  * deterministic features — no stub anywhere in the path. */
class JdkCodecSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def pngBytes(w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, f(x, y))
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private def wavBytes(seconds: Double, hz: Double, rate: Float = 8000f): Array[Byte] = {
    val n = (seconds * rate).toInt
    val data = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = (math.sin(2 * math.Pi * hz * i / rate) * 12000).toShort
      data(i * 2) = (s & 0xff).toByte
      data(i * 2 + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(rate, 16, 1, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(data), fmt, n.toLong)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  private val gradient = pngBytes(64, 48) { (x, y) => (x * 4 << 16) | (y * 5 << 8) | 0x40 }
  private val checker = pngBytes(64, 48) { (x, y) => if ((x / 8 + y / 8) % 2 == 0) 0xffffff else 0 }
  private val tone = wavBytes(1.0, 440)

  private def mediaDf(rows: Seq[Row]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Multimodal.mediaSchema)

  test("real PNG decode: fixed-dim deterministic features that separate distinct images") {
    val media = mediaDf(Seq(
      Row(1L, "image", gradient, "image/png", 64, 48, null, 10L),
      Row(2L, "image", gradient, "image/png", 64, 48, null, 11L),
      Row(3L, "image", checker, "image/png", 64, 48, null, 12L)))
    val f = Multimodal.decodeFeatures(media, dim = 64, codec = JdkCodec).cache()
    assert(f.filter(!col("decode_ok")).isEmpty)
    assert(f.filter(size(col("feature")) =!= 64).isEmpty)
    val rows = f.orderBy("media_id").collect()
    assert(rows(0).getSeq[Float](2) === rows(1).getSeq[Float](2),
      "identical bytes must decode to identical features")
    assert(rows(0).getSeq[Float](2) !== rows(2).getSeq[Float](2),
      "different images must decode to different features")
    // features are real luminance: the gradient's mean differs from a flat 0
    assert(rows(0).getSeq[Float](2).exists(_ != 0f))
    f.unpersist()
  }

  test("real resize: output is a valid PNG with the requested dimensions, deterministic") {
    val media = mediaDf(Seq(Row(1L, "image", gradient, "image/png", 64, 48, null, 10L)))
    val out = Multimodal.resizeImages(media, 16, 12, codec = JdkCodec)
      .select("payload").collect()
    val once = out.head.getAs[Array[Byte]](0)
    val img = ImageIO.read(new ByteArrayInputStream(once))
    assert(img.getWidth === 16 && img.getHeight === 12)
    val again = Multimodal.resizeImages(media, 16, 12, codec = JdkCodec)
      .select("payload").collect().head.getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(once, again), "resize must be bit-deterministic")
  }

  test("real WAV decode + sample-accurate segmentation: every segment is a parseable WAV") {
    val media = mediaDf(Seq(Row(5L, "audio", tone, "audio/wav", null, null, 1000L, 20L)))
    val f = Multimodal.decodeFeatures(media, dim = 16, codec = JdkCodec).collect().head
    assert(f.getAs[Boolean]("decode_ok"))
    // a steady tone has roughly uniform per-bucket RMS, all above silence
    val feat = f.getSeq[Float](2)
    assert(feat.length === 16 && feat.forall(v => v > -0.5f))

    val segs = Multimodal.segmentAudio(media, segMs = 250, codec = JdkCodec)
      .orderBy("seg_index").collect()
    assert(segs.length === 4) // ceil(1000 / 250)
    val frames = segs.map { r =>
      val in = AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(r.getAs[Array[Byte]]("payload")))
      try in.getFrameLength finally in.close()
    }
    assert(frames.sum === 8000L, "segments must cover every PCM frame exactly once")
    assert(frames.forall(n => n == 2000L), "1s at 8kHz in 4 cuts = 2000 frames each")
    assert(segs.map(r => r.getAs[Long]("seg_start_ms")).toSeq === Seq(0L, 250L, 500L, 750L))
  }

  test("video stays undecodable through the JDK codec (no JDK video codec)") {
    val media = mediaDf(Seq(Row(9L, "video", gradient, "video/mp4", 64, 48, 1000L, 30L)))
    val f = Multimodal.decodeFeatures(media, dim = 8, codec = JdkCodec).collect().head
    assert(!f.getAs[Boolean]("decode_ok"))
    assert(Multimodal.sampleVideoFrames(media, 4, codec = JdkCodec).isEmpty)
  }

  test("JDK features drive the similarity stack: exact duplicate found by cosine") {
    val media = mediaDf(Seq(
      Row(1L, "image", gradient, "image/png", 64, 48, null, 10L),
      Row(2L, "image", gradient, "image/png", 64, 48, null, 11L),
      Row(3L, "image", checker, "image/png", 64, 48, null, 12L)))
    val emb = Multimodal.decodeFeatures(media, dim = 64, codec = JdkCodec)
      .select(col("media_id").as("vec_id"), col("feature").as("embedding"))
    val dups = Similarity.embeddingNearDupPairs(emb, threshold = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(dups.toSeq === Seq((1L, 2L)),
      "identical images must be the only near-dup pair at 0.999")
  }
}
