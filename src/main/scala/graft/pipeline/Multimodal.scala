package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Typed view of one multimodal asset: opaque bytes + metadata. */
case class MediaAsset(doc_id: Long, media_type: String, bytes: Array[Byte])

/** Decoded (stub) features of one asset. */
case class MediaFeatures(doc_id: Long, media_type: String, byte_len: Long,
    width: Int, height: Int, n_frames: Int, checksum: String)

/**
 * Multimodal columns: image/audio/video as opaque `binary` columns with
 * typed metadata, decoded per-partition.
 *
 * The Spark-side plumbing is real — binary envelope schema, partition-
 * parallel `mapPartitions` decode (the Scala shape of a `mapInPandas`
 * batch UDF), deterministic feature schema. The perceptual codec here is
 * a STUB: this container has no image/audio libraries, so `decodeStub`
 * derives fake-but-deterministic dimensions from the payload. Swapping
 * in a real decoder changes only the function body, not the pipeline —
 * [[WavCodec]] demonstrates that with a REAL container format
 * (PCM WAV/RIFF build + chunk-walking parse, p19_wav_decode).
 */
object Multimodal {

  /** Wrap documents as binary media assets (UTF-8 payload stands in for
   * image/audio bytes; media type derived from the id). */
  def asAssets(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      // NULL text wraps as the empty asset (the library-wide NULL==""
      // convention); a null bytes column would NPE every decoder
      encode(coalesce(col("text"), lit("")), "UTF-8").as("bytes"))

  /**
   * STUB decoder — deterministic pseudo-decode so the distributed plumbing
   * is testable end-to-end. A real implementation would call the codec
   * here (per partition: open once, decode each asset, emit features).
   */
  def decodeStub(assets: Dataset[MediaAsset]): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // (real codecs would be initialized once per partition here)
      it.map { a =>
        val len = a.bytes.length.toLong
        MediaFeatures(
          doc_id = a.doc_id,
          media_type = a.media_type,
          byte_len = len,
          width = (64 + len % 512).toInt,
          height = (64 + (len * 7) % 512).toInt,
          n_frames = (1 + len % 10).toInt,
          checksum = java.security.MessageDigest.getInstance("MD5")
            .digest(a.bytes).map("%02x".format(_)).mkString)
      }
    }
  }

  /** Frame sampling (stub): every k-th 4-byte slice of the payload as a hex
   * token — the partition/batch shape of real frame extraction. */
  def sampleFrames(assets: DataFrame, stride: Int, frames: Int): DataFrame =
    assets.select(col("doc_id"), col("media_type"),
      posexplode(expr(
        s"transform(sequence(0, ${frames - 1}), i -> hex(substring(bytes, 1 + $stride * i, 4)))"))
        .as(Seq("frame_idx", "frame_token")))

  /** Full stub pipeline over the documents table. */
  def decodeDocuments(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    decodeStub(asAssets(docs).as[MediaAsset]).toDF()
  }
}
