package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` columns with typed
  * metadata, processed by per-partition batch "decoders".
  *
  * The real decode (image/audio libs) is NOT available in this environment,
  * so `fakeDecode` is a clearly-marked deterministic stand-in — but the
  * Spark-side plumbing is real and is what matters at 100 TB: binary columns
  * survive parquet encoding, the decoder runs as `mapPartitions` over the
  * executors (one JVM call per batch, no per-row driver interaction), and
  * the output schema is a typed case class.
  */
object Multimodal {

  /** A media row: opaque payload + metadata (what an image/audio table
    * looks like in a training-data lake). */
  final case class MediaRow(doc_id: Long, payload: Array[Byte], media_type: String)

  /** Extracted features — the decoder's typed output. */
  final case class MediaFeatures(
      doc_id: Long, media_type: String,
      width: Int, height: Int, n_bytes: Long, checksum: Long)

  /** Pack a text table into a media table: payload = utf-8 bytes (standing in
    * for encoded image bytes), media_type round-robin. Pure projection. */
  def packMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col(idCol) % 3 + 1).cast("int")).as("media_type"))

  /** STUB DECODER — deterministic fake in place of a real image/audio decode
    * (libs unavailable in this container). Derives "dimensions" and a
    * checksum from the payload bytes alone, so results are reproducible and
    * oracle-checkable. The mapPartitions batch shape is the real thing: a
    * production decoder would swap the body for JNI/FFmpeg/turbojpeg calls
    * and keep the exact same plumbing. */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init would go here (decoder handles, buffers, ...)
      rows.map { r =>
        val n = r.payload.length.toLong
        var sum = 0L
        var i = 0
        while (i < r.payload.length) { sum += (r.payload(i) & 0xff); i += 1 }
        MediaFeatures(
          doc_id = r.doc_id,
          media_type = r.media_type,
          width = (n % 64).toInt + 1,
          height = (n % 48).toInt + 1,
          n_bytes = n,
          checksum = sum)
      }
    }
  }

  /** End-to-end: pack → decode → features DataFrame. */
  def extract(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    import docs.sparkSession.implicits._
    decodeFeatures(packMedia(docs, idCol, textCol).as[MediaRow]).toDF()
  }
}
