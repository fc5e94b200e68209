package graft.operators

import graft.functions.GraftFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * F15 — wire-payload compression, the producer/consumer codec pair.
 *
 * Reference semantics: the producer compresses the payload and stamps
 * `compression` + `uncompressed_size` on MessageMetadata; the consumer
 * selects the codec from the metadata and decompresses, validating the
 * size (reference: PulsarApi.proto:46-52,112-117,
 * pulsar-common/.../compression/CompressionCodecProvider.java,
 * ConsumerImpl#decompressPayloadIfNeeded). All five reference codecs
 * (NONE/LZ4/ZLIB/ZSTD/SNAPPY) are real. Pure column transforms: the
 * codec runs inside whole-stage codegen, no shuffle, and the metadata
 * columns travel with the row exactly like the wire format.
 */
object Compression {

  /** The reference's CompressionType enum values. */
  val codecs: Seq[String] = Seq("NONE", "LZ4", "ZLIB", "ZSTD", "SNAPPY")

  /** Producer side: compress `value_bin` with the (per-row) codec,
   * stamp codec + original size. */
  def compress(env: DataFrame, codec: Column = lit("ZLIB"), level: Int = 6): DataFrame =
    env.withColumn("uncompressed_size", octet_length(col("value_bin")))
      .withColumn("compression", codec)
      .withColumn("value_bin",
        payloadCompress(col("value_bin"), col("compression"), level))

  /** Consumer side: decompress by the stamped codec and validate against
   * `uncompressed_size` (a mismatch or malformed stream marks the row
   * corrupt — `value_bin` NULL / size_ok false — instead of failing the
   * scan; the reference's size check discards to the DLQ path). Unstamped
   * rows pass through as NONE. */
  def decompress(env: DataFrame): DataFrame =
    env.withColumn("value_bin",
      payloadDecompress(col("value_bin"),
        coalesce(col("compression"), lit("NONE")),
        coalesce(col("uncompressed_size"), octet_length(col("value_bin")))))
      .withColumn("size_ok",
        col("uncompressed_size").isNull ||
          (col("value_bin").isNotNull &&
            octet_length(col("value_bin")) === col("uncompressed_size")))
}
