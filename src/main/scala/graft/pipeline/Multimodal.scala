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
}
