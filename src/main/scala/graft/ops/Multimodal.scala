package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque binary payloads + typed metadata,
  * with batched per-partition feature extraction.
  *
  * The Spark-side machinery here — binary columns with a metadata struct,
  * deterministic partition-local batch processing, fixed-width float
  * feature output — is real and tested. The DECODE step is a STUB: this
  * container has no image/audio codecs, so `decodeStub` derives features
  * from raw bytes (a 16-bin byte histogram). Swapping in a real decoder
  * changes only the body of `decodeStub`; schema, batching, and
  * partitioning are unchanged.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media: Array[Byte], mime: String, n_bytes: Int)
  case class MediaFeature(doc_id: Long, n_bytes: Int, feature: Array[Float])

  /** Wrap a text corpus as a media table: binary payload + metadata struct
    * (the shape an image/audio table would have; payload is opaque bytes).
    */
  def asMediaTable(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      lit("text/plain").as("mime"),
      length(encode(col("text"), "UTF-8")).as("n_bytes"))

  /** STUB decode: 16-bin byte histogram, L1-normalized — stands in for
    * image decode / audio feature extraction. Deterministic and
    * partition-local (mapPartitions batches rows through one "decoder"
    * instance per partition, the same lifecycle a real codec needs).
    */
  def decodeStub(spark: SparkSession, media: DataFrame): Dataset[MediaFeature] = {
    import spark.implicits._
    media.select("doc_id", "media", "mime", "n_bytes").as[MediaRow]
      .mapPartitions { rows =>
        // per-partition "decoder" init would go here (codec handle, model…)
        rows.map { r =>
          val hist = new Array[Float](16)
          var i = 0
          while (i < r.media.length) {
            hist((r.media(i) & 0xFF) / 16) += 1f
            i += 1
          }
          val total = math.max(1, r.media.length).toFloat
          MediaFeature(r.doc_id, r.media.length, hist.map(_ / total))
        }
      }
  }

  /** "Frame sampling" over an opaque payload: k fixed-width byte windows at
    * even strides (the video-frame-sample access pattern, bytes standing in
    * for frames).
    */
  def frameSample(media: DataFrame, frames: Int = 4, width: Int = 8): DataFrame =
    media.select(col("doc_id"), col("n_bytes"),
      transform(sequence(lit(0), lit(frames - 1)),
        i => col("media").substr(lit(1) + i * (col("n_bytes") / frames).cast("int"), lit(width)))
        .as("frames"))
}
