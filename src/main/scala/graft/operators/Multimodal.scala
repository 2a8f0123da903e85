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

  /** A resized media row (payload re-encoded at the target dimensions). */
  final case class ResizedRow(
      doc_id: Long, media_type: String,
      width: Int, height: Int, payload: Array[Byte], checksum: Long)

  /** STUB RESIZE — nearest-neighbor byte resampling standing in for a real
    * image resize (out[i] = in[i*n/(w*h)]): deterministic, checkable, and
    * exactly the production batch shape (binary in → binary out inside one
    * mapPartitions; swap the body for libvips/turbojpeg). */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[ResizedRow] = {
    import media.sparkSession.implicits._
    val outLen = w * h
    media.mapPartitions { rows =>
      rows.map { r =>
        val n = r.payload.length
        val out = new Array[Byte](outLen)
        var i = 0
        while (i < outLen) {
          out(i) = if (n == 0) 0 else r.payload((i.toLong * n / outLen).toInt)
          i += 1
        }
        var sum = 0L
        i = 0
        while (i < outLen) { sum += (out(i) & 0xff); i += 1 }
        ResizedRow(r.doc_id, r.media_type, w, h, out, sum)
      }
    }
  }

  /** One sampled frame of a "video" payload. */
  final case class FrameRow(
      doc_id: Long, frame_idx: Int, n_frames: Int, frame_bytes: Int, checksum: Long)

  /** STUB FRAME-SAMPLE — treat the payload as fixed-size frames and keep
    * every `everyN`-th (a flatMap: one input row → many frame rows, the real
    * fan-out shape of video pipelines; a production version decodes
    * keyframes via FFmpeg in the same loop). */
  def frameSample(
      media: Dataset[MediaRow], frameSize: Int, everyN: Int): Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val nFrames = (r.payload.length + frameSize - 1) / frameSize
      (0 until nFrames).by(everyN).map { f =>
        val start = f * frameSize
        val end = math.min(start + frameSize, r.payload.length)
        var sum = 0L
        var i = start
        while (i < end) { sum += (r.payload(i) & 0xff); i += 1 }
        FrameRow(r.doc_id, f, nFrames, end - start, sum)
      }
    }
  }

  /** Materialize a media table as ONE FILE PER ITEM (`doc_<id>.bin`) — the
    * on-disk shape real multimodal lakes ingest from (a crawl delivers
    * millions of image/audio files, not parquet). The write runs
    * `foreachPartition` on the EXECUTORS via the Hadoop FS API — the
    * driver never touches a payload, so the writer scales with the
    * cluster exactly like any other sink. Pair with
    * `spark.read.format("binaryFile")` to ingest such a directory back
    * into a binary-column table (q188); at real scale set
    * `pathGlobFilter`/`recursiveFileLookup` and lean on the parallel file
    * listing — binaryFile caps file size at
    * `spark.sql.sources.binaryFile.maxLength` (int max) per file. */
  def writeMediaFiles(media: DataFrame, dir: String): Unit = {
    media.select(col("doc_id"), col("payload"))
      .foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
        // executor-side handles: a fresh Configuration resolves the same
        // default FS the driver's path implies (file:// locally, the
        // cluster FS on a real deployment)
        val conf = new org.apache.hadoop.conf.Configuration()
        val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
        rows.foreach { r =>
          val out = fs.create(
            new org.apache.hadoop.fs.Path(s"$dir/doc_${r.getLong(0)}.bin"), true)
          try out.write(r.getAs[Array[Byte]](1)) finally out.close()
        }
      }
  }

  /** PACKFILE sharding (the WebDataset/tar-shard pattern): concatenate
    * many small payloads into ONE blob per shard plus a byte-offset
    * INDEX — the lakehouse answer to the small-files problem for
    * multimodal corpora (a billion 50 KiB images as a million 50 MiB
    * shards; open-cost amortizes, range reads stay random-access).
    *
    * One pass per partition, all executor-side: each input partition
    * becomes one shard row (shard_id, blob) and its index rows
    * (id, shard_id, offset, len). Returns (blobs, index) DataFrames —
    * persist both; fetch = index lookup + ONE `substr` range read on the
    * shard blob (see [[unpack]]), never a per-item file open.
    *
    * Shard size = input partition size: `repartition(n)` upstream to hit
    * the target (real deployments aim 100 MiB-ish; parquet binary cells
    * cap at int max). */
  def packShards(items: DataFrame, idCol: String, payloadCol: String)
      : (DataFrame, DataFrame) = {
    val spark = items.sparkSession
    import spark.implicits._
    val packed = items.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val buf = new java.io.ByteArrayOutputStream()
        val idx = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Long, Long)]
        it.foreach { case (id, payload) =>
          idx += ((id, pid, buf.size().toLong, payload.length.toLong))
          buf.write(payload)
        }
        if (idx.isEmpty) Iterator.empty
        else Iterator((pid, buf.toByteArray, idx.toSeq))
      }
      .toDF("shard_id", "blob", "idx")
      .localCheckpoint(true) // one pass: blobs and index both read this
    val blobs = packed.select(col("shard_id"), col("blob"))
    val index = packed.select(explode(col("idx")).as("e"))
      .select(col("e._1").as("id"), col("e._2").as("shard_id"),
        col("e._3").as("offset"), col("e._4").as("len"))
    (blobs, index)
  }

  /** Range-read items back out of packfile shards: index ⋈ blobs (the
    * blob side has one row per shard — model-sized row count, payload
    * bytes move once), then a codegen'd `substr` slice per item. */
  def unpack(blobs: DataFrame, index: DataFrame): DataFrame =
    index.join(blobs, "shard_id")
      .select(col("id"),
        expr("substring(blob, CAST(offset AS INT) + 1, CAST(len AS INT))")
          .as("payload"))

  /** STUB FEATURE-EXTRACT, integer-exact flavor: same hash-projection
    * shape as [[embed]] but accumulating INTEGER votes (v(j) += b − 127,
    * j = (b·31 + i) mod dim). Every downstream distance is then exact
    * long arithmetic, so the whole media→embedding→ANN bridge is
    * SQL-oracle-verifiable end-to-end (q76); [[embed]] stays the float
    * production shape. */
  def embedQuantized(media: Dataset[MediaRow], dim: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.map { r =>
      val v = new Array[Long](dim)
      var i = 0
      while (i < r.payload.length) {
        val b = r.payload(i) & 0xff
        v((b * 31 + i) % dim) += b - 127
        i += 1
      }
      (r.doc_id, v.toSeq)
    }.toDF("doc_id", "embedding")
  }

  /** STUB FEATURE-EXTRACT — payload → dense embedding (deterministic
    * hash-projection stand-in for a vision/audio encoder). Output feeds the
    * Similarity/Dedup ANN operators unchanged — the multimodal→embedding
    * bridge of a training-data pipeline. */
  def embed(media: Dataset[MediaRow], dim: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.map { r =>
      val v = new Array[Float](dim)
      var i = 0
      while (i < r.payload.length) {
        val j = ((r.payload(i) & 0xff) * 31 + i) % dim
        v(j) += ((r.payload(i) & 0xff) - 127.5f) / 127.5f
        i += 1
      }
      (r.doc_id, v.toSeq)
    }.toDF("doc_id", "embedding")
  }
}
