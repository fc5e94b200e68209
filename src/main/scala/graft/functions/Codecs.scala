package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * F15 — payload compression codecs.
 *
 * The reference compresses each entry's payload producer-side and
 * decompresses consumer-side, with `compression` + `uncompressed_size`
 * stamped in MessageMetadata (reference: PulsarApi.proto:112-117,
 * pulsar-common/.../compression/CompressionCodecZLib.java). ZLIB is the
 * one reference codec with a JDK-native implementation (java.util.zip is
 * the same zlib), so it is implemented for real; LZ4/ZSTD/SNAPPY would be
 * drop-in replacements of the two static methods here. Storage-level
 * compression is separately Parquet's codec config — this is the WIRE
 * payload codec, visible to payload processors and chunk reassembly.
 */
object ZlibCodec {

  def deflate(in: Array[Byte], level: Int): Array[Byte] = {
    val d = new java.util.zip.Deflater(level)
    try {
      d.setInput(in)
      d.finish()
      val out = new java.io.ByteArrayOutputStream(Math.max(32, in.length / 2))
      val buf = new Array[Byte](4096)
      while (!d.finished()) {
        val n = d.deflate(buf)
        out.write(buf, 0, n)
      }
      out.toByteArray
    } finally d.end()
  }

  def inflate(in: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(in)
      val out = new java.io.ByteArrayOutputStream(Math.max(32, in.length * 3))
      val buf = new Array[Byte](4096)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0 && !inf.finished() && inf.needsInput())
          throw new java.util.zip.DataFormatException("truncated zlib stream")
        out.write(buf, 0, n)
      }
      out.toByteArray
    } finally inf.end()
  }
}

/**
 * The full reference codec set, dispatched by name exactly like
 * CompressionCodecProvider's CompressionType switch (reference:
 * PulsarApi.proto:46-52, pulsar-common/.../compression/
 * CompressionCodecProvider.java). ZLIB is java.util.zip; LZ4
 * (lz4-java), ZSTD (zstd-jni) and SNAPPY (snappy-java) ride the same
 * libraries Spark itself ships for shuffle/parquet compression. LZ4 and
 * ZSTD decompress need the `uncompressed_size` the producer stamps on
 * MessageMetadata — the same contract the reference's codecs have.
 */
object WireCodecs {
  @transient private lazy val lz4 = net.jpountz.lz4.LZ4Factory.fastestInstance()

  def compress(codec: String, in: Array[Byte], level: Int): Array[Byte] =
    codec match {
      case "NONE" => in
      case "ZLIB" => ZlibCodec.deflate(in, level)
      case "LZ4" => lz4.fastCompressor().compress(in)
      case "ZSTD" => com.github.luben.zstd.Zstd.compress(in, level)
      case "SNAPPY" => org.xerial.snappy.Snappy.compress(in)
      case other => throw new IllegalArgumentException(s"unknown codec: $other")
    }

  def decompress(codec: String, in: Array[Byte], uncompressedSize: Int): Array[Byte] =
    codec match {
      case "NONE" => in
      case "ZLIB" => ZlibCodec.inflate(in)
      case "LZ4" => lz4.fastDecompressor().decompress(in, uncompressedSize)
      case "ZSTD" => com.github.luben.zstd.Zstd.decompress(in, uncompressedSize)
      case "SNAPPY" => org.xerial.snappy.Snappy.uncompress(in)
      case other => throw new IllegalArgumentException(s"unknown codec: $other")
    }

  /** [[decompress]] that degrades a malformed payload to NULL instead of
   * throwing, so one corrupt row marks itself (size_ok=false / DLQ path)
   * rather than failing the whole scan. An unknown codec name is still a
   * programming error and propagates. */
  def decompressOrNull(codec: String, in: Array[Byte], uncompressedSize: Int): Array[Byte] =
    if (!codecNames.contains(codec))
      throw new IllegalArgumentException(s"unknown codec: $codec")
    else
      try decompress(codec, in, uncompressedSize)
      catch { case scala.util.control.NonFatal(_) => null }

  private val codecNames = Set("NONE", "ZLIB", "LZ4", "ZSTD", "SNAPPY")
}

/** Codegen'd `payload_compress(payload, codec)` — the producer side;
 * codec is a per-row STRING column, as on the wire. */
case class PayloadCompress(left: Expression, right: Expression, level: Int = 6)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"payload_compress needs (BINARY, STRING), got (${l.sql}, ${r.sql})")
    }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "payload_compress"

  override def nullSafeEval(payload: Any, codec: Any): Any =
    WireCodecs.compress(codec.asInstanceOf[UTF8String].toString,
      payload.asInstanceOf[Array[Byte]], level)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (p, c) =>
      s"graft.functions.WireCodecs.compress($c.toString(), $p, $level)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PayloadCompress =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd `payload_decompress(payload, codec, uncompressed_size)` —
 * the consumer side (ConsumerImpl#decompressPayloadIfNeeded). */
case class PayloadDecompress(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (BinaryType, StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (f, s, t) => TypeCheckResult.TypeCheckFailure(
        s"payload_decompress needs (BINARY, STRING, INT), got (${f.sql}, ${s.sql}, ${t.sql})")
    }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true // malformed payloads degrade to NULL
  override def prettyName: String = "payload_decompress"

  override def nullSafeEval(payload: Any, codec: Any, size: Any): Any =
    WireCodecs.decompressOrNull(codec.asInstanceOf[UTF8String].toString,
      payload.asInstanceOf[Array[Byte]], size.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (p, c, s) => s"""
      ${ev.value} = graft.functions.WireCodecs.decompressOrNull($c.toString(), $p, $s);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): PayloadDecompress =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Codegen'd `zlib_deflate(payload)` — BINARY → BINARY. */
case class ZlibDeflate(child: Expression, level: Int = 6)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"zlib_deflate needs BINARY input, got ${t.sql}")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "zlib_deflate"

  override def nullSafeEval(input: Any): Any =
    ZlibCodec.deflate(input.asInstanceOf[Array[Byte]], level)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ZlibCodec.deflate($c, $level)")

  override protected def withNewChildInternal(newChild: Expression): ZlibDeflate =
    copy(child = newChild)
}

/** Codegen'd `zlib_inflate(payload)` — BINARY → BINARY. */
case class ZlibInflate(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"zlib_inflate needs BINARY input, got ${t.sql}")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "zlib_inflate"

  override def nullSafeEval(input: Any): Any =
    ZlibCodec.inflate(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ZlibCodec.inflate($c)")

  override protected def withNewChildInternal(newChild: Expression): ZlibInflate =
    copy(child = newChild)
}
