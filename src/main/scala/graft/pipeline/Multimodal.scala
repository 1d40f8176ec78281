package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata extracted executor-side.
  *
  * The decode step is a clearly-marked STUB (no image/audio codecs in this
  * container): [[decodeStub]] derives deterministic fake dimensions from the
  * payload bytes. Everything around it is the real 100 TB-shape pipeline:
  * a typed `Dataset[MediaRow]`, `mapPartitions` so a real decoder could
  * amortize per-partition init (model load, codec context) exactly like a
  * Pandas-UDF batch, and a narrow map-only plan with no shuffle.
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

  /** STUB decoder — replace with a real codec (JPEG header parse, ffprobe,
    * …) in a container that has one. Deterministic on payload bytes. */
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
