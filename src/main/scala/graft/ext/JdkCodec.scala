package graft.ext

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem}

/** A REAL [[Multimodal.MediaCodec]] built entirely on codecs the JDK itself
  * ships — zero dependencies, works in an offline environment:
  *
  *  - images: `javax.imageio.ImageIO` (PNG/JPEG/BMP/GIF decode + PNG encode)
  *  - audio:  `javax.sound.sampled.AudioSystem` (WAV/AIFF parse + WAV encode)
  *  - video:  the JDK ships no video codec — video payloads are undecodable
  *    here by design (`decode` returns None, `sampleFrames` is empty); a
  *    production deployment plugs a JNI/ffmpeg-backed codec into the same
  *    seam.
  *
  * Determinism: every pixel/sample path below is pure arithmetic over the
  * decoded raster/PCM — resampling is explicit nearest-neighbor indexing
  * (NOT the Graphics2D rendering pipeline, whose output may vary with
  * rendering hints/platform), so identical bytes always produce identical
  * features, resized images, and segments; the dedup/similarity stages
  * stay reproducible over real media exactly as they are over [[Multimodal.FakeCodec]]'s
  * pseudo-features.
  *
  * Mirrors the multimodal stage contracts at `Multimodal.decodeFeatures` /
  * `resizeImages` / `sampleVideoFrames` / `segmentAudio`; reference scope
  * note: the reference pipeline has no media handling at all, this module is
  * part of the training-data extension surface (SURVEY §2.10).
  */
object JdkCodec extends Multimodal.MediaCodec {

  private def readImage(payload: Array[Byte]): Option[BufferedImage] =
    if (payload == null || payload.isEmpty) None
    else Option(ImageIO.read(new ByteArrayInputStream(payload)))

  /** sRGB luminance in [0,1] from a packed ARGB int. */
  private def luminance(argb: Int): Double = {
    val r = (argb >> 16) & 0xff
    val g = (argb >> 8) & 0xff
    val b = argb & 0xff
    (0.299 * r + 0.587 * g + 0.114 * b) / 255.0
  }

  /** Explicit nearest-neighbor resample (deterministic; no Graphics2D). */
  private def resampleNN(img: BufferedImage, w: Int, h: Int): BufferedImage = {
    val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      val sy = math.min(img.getHeight - 1, y.toLong * img.getHeight / h).toInt
      var x = 0
      while (x < w) {
        val sx = math.min(img.getWidth - 1, x.toLong * img.getWidth / w).toInt
        out.setRGB(x, y, img.getRGB(sx, sy) | 0xff000000)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Decoded PCM as mono double samples in [-1,1], or None if unparseable. */
  private def pcmMono(payload: Array[Byte]): Option[(AudioFormat, Array[Double])] = {
    if (payload == null || payload.isEmpty) return None
    try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
      try {
        val src = in.getFormat
        val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
          src.getSampleRate, 16, src.getChannels,
          src.getChannels * 2, src.getSampleRate, false)
        val pcm = AudioSystem.getAudioInputStream(fmt, in)
        val bytes = pcm.readAllBytes()
        val ch = fmt.getChannels
        val n = bytes.length / (2 * ch)
        val mono = new Array[Double](n)
        var i = 0
        while (i < n) {
          var acc = 0.0
          var c = 0
          while (c < ch) {
            val off = (i * ch + c) * 2
            val s = ((bytes(off + 1) << 8) | (bytes(off) & 0xff)).toShort
            acc += s / 32768.0
            c += 1
          }
          mono(i) = acc / ch
          i += 1
        }
        Some((src, mono))
      } finally in.close()
    } catch { case _: Exception => None }
  }

  /** bytes -> fixed-dim feature vector.
    *
    * images: nearest-neighbor downsample to a g x g grid (g = ceil(sqrt(dim)))
    * and emit per-cell luminance - 0.5 — a deterministic "thumbnail
    * embedding" whose cosine similarity tracks visual similarity well enough
    * to drive the dedup/ANN stages. audio: per-bucket RMS energy - 0.5 over
    * `dim` equal sample ranges. video: None (no JDK codec). */
  override def decode(kind: String, payload: Array[Byte], dim: Int): Option[Array[Float]] =
    kind match {
      case "image" =>
        readImage(payload).map { img =>
          val g = math.ceil(math.sqrt(dim.toDouble)).toInt
          val small = resampleNN(img, g, g)
          val out = new Array[Float](dim)
          var i = 0
          while (i < dim) {
            out(i) = (luminance(small.getRGB(i % g, i / g)) - 0.5).toFloat
            i += 1
          }
          out
        }
      case "audio" =>
        pcmMono(payload).collect { case (_, mono) if mono.length > 0 =>
          val out = new Array[Float](dim)
          var b = 0
          while (b < dim) {
            val from = (mono.length.toLong * b / dim).toInt
            val to = math.max(from + 1, (mono.length.toLong * (b + 1) / dim).toInt)
            var acc = 0.0
            var i = from
            while (i < to) { acc += mono(i) * mono(i); i += 1 }
            out(b) = (math.sqrt(acc / (to - from)) - 0.5).toFloat
            b += 1
          }
          out
        }
      case _ => None // video: the JDK ships no video codec
    }

  /** Real image resize: decode, nearest-neighbor resample, re-encode as PNG
    * (the JDK PNG encoder is deterministic for a given raster). Undecodable
    * payloads pass through unchanged rather than corrupting the column. */
  override def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte] =
    readImage(payload) match {
      case Some(img) =>
        val out = new ByteArrayOutputStream()
        ImageIO.write(resampleNN(img, w, h), "png", out)
        out.toByteArray
      case None => if (payload == null) Array.emptyByteArray else payload
    }

  /** No JDK video codec: undecodable by design (see class doc). */
  override def sampleFrames(payload: Array[Byte], n: Int): Seq[Array[Byte]] = Seq.empty

  /** Sample-accurate audio segmentation: segment i covers PCM frames
    * [N*i/n, N*(i+1)/n) of the decoded stream and is re-encoded as a
    * standalone WAV (parseable by any audio tool), unlike the byte-range
    * stand-in in [[Multimodal.FakeCodec]]. Unparseable payloads yield no segments. */
  override def segment(payload: Array[Byte], n: Int): Seq[Array[Byte]] = {
    if (payload == null || payload.isEmpty || n <= 0) return Seq.empty
    try {
      val probe = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
      val fmt = probe.getFormat
      val total = probe.getFrameLength
      probe.close()
      if (total <= 0) return Seq.empty
      (0 until n).map { i =>
        val from = total * i / n
        val count = total * (i + 1) / n - from
        val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
        try {
          in.skipNBytes(from * fmt.getFrameSize)
          val seg = new AudioInputStream(in, fmt, count)
          val out = new ByteArrayOutputStream()
          AudioSystem.write(seg, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
          out.toByteArray
        } finally in.close()
      }
    } catch { case _: Exception => Seq.empty }
  }
}
