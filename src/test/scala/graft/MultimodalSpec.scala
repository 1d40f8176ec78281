package graft

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.functions._
import graft.pipeline.Multimodal

/** Real image decode/resize through the JDK's ImageIO — deterministic
  * synthesized PNGs, no external codec, no stub. */
class MultimodalSpec extends SparkTestBase {

  /** Deterministic RGB PNG: pixel (x, y) = f(doc seed, x, y). */
  private def png(seed: Int, w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, (seed * 2654435761L + x * 31 + y * 131).toInt & 0xffffff)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def mediaDf = {
    val rows = Seq(
      (1L, png(1, 640, 480)),
      (2L, png(2, 100, 50)),
      (3L, png(3, 512, 512)),
      (4L, "not an image at all".getBytes("UTF-8"))) // undecodable
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "payload")
  }

  test("extractImageFeatures decodes real PNG headers: dims, format, drop undecodable") {
    implicit val s = spark
    val got = Multimodal.extractImageFeatures(mediaDf).collect().sortBy(_.doc_id)
    assert(got.map(_.doc_id).toSeq == Seq(1L, 2L, 3L)) // doc 4 dropped, not an error
    assert(got.map(f => (f.width, f.height)).toSeq ==
      Seq((640L, 480L), (100L, 50L), (512L, 512L)))
    assert(got.forall(_.format == "image/png"))
    assert(got.forall(f => f.byte_len > 0))
  }

  test("resizeImages: aspect-preserving fit to 256, output is a real decodable PNG") {
    implicit val s = spark
    val got = Multimodal.resizeImages(mediaDf, maxDim = 256).collect()
      .sortBy(_.doc_id).map(r => r.doc_id -> r).toMap
    // 640x480 -> 256x192 (scale 0.4); 100x50 within bounds -> unchanged;
    // 512x512 -> 256x256
    assert((got(1L).width, got(1L).height) == (256L, 192L))
    assert((got(2L).width, got(2L).height) == (100L, 50L))
    assert((got(3L).width, got(3L).height) == (256L, 256L))
    assert(!got.contains(4L))
    // round-trip: every output payload decodes as a PNG of the claimed size
    got.values.foreach { r =>
      val img = ImageIO.read(new ByteArrayInputStream(r.payload))
      assert(img != null)
      assert(img.getWidth.toLong == r.width && img.getHeight.toLong == r.height)
    }
  }

  test("resize is a narrow map-only plan: no shuffle exchange") {
    implicit val s = spark
    val plan = Multimodal.resizeImages(mediaDf.repartition(4, col("doc_id")))
      .queryExecution.executedPlan.toString
    // the input repartition is the only exchange; the resize itself adds none
    assert(plan.split("Exchange").length - 1 <= 1)
  }

  /** Deterministic 16-bit mono WAV: a full-scale square wave (RMS = full
    * scale exactly, so the ‰ loudness is 1000 with no float ambiguity). */
  private def wav(seed: Int, sampleRate: Float, nFrames: Int,
                  amplitude: Short): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(sampleRate, 16, 1, true, false)
    val pcm = new Array[Byte](nFrames * 2)
    var i = 0
    while (i < nFrames) {
      val s: Short = if (((i / 8) + seed) % 2 == 0) amplitude
                     else (-amplitude).toShort
      pcm(i * 2) = (s & 0xff).toByte
      pcm(i * 2 + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("extractAudioFeatures decodes real WAV: rate, frames, duration, exact RMS") {
    implicit val s = spark
    import s.implicits._
    val rows = Seq(
      (1L, wav(0, 16000f, 16000, 16384)),   // 1 s @ 16 kHz, half scale
      (2L, wav(1, 8000f, 2000, 32767)),     // 250 ms @ 8 kHz, full scale
      (3L, "definitely not audio".getBytes("UTF-8"))) // undecodable
      .toDF("doc_id", "payload")
    val got = Multimodal.extractAudioFeatures(rows).collect()
      .map(f => f.doc_id -> f).toMap
    assert(got.keySet == Set(1L, 2L)) // doc 3 dropped, not an error
    assert(got(1L).sample_rate == 16000L && got(1L).channels == 1L &&
      got(1L).bits == 16L && got(1L).n_frames == 16000L &&
      got(1L).duration_ms == 1000L)
    assert(got(2L).sample_rate == 8000L && got(2L).n_frames == 2000L &&
      got(2L).duration_ms == 250L)
    // square wave RMS = amplitude: half scale -> 500 per mille (16384/32768
    // exactly); full scale -> round(32767/32768*1000) = 1000
    assert(got(1L).rms_x1000 == 500L, s"got ${got(1L).rms_x1000}")
    assert(got(2L).rms_x1000 == 1000L, s"got ${got(2L).rms_x1000}")
  }
}
