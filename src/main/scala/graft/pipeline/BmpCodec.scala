package graft.pipeline

import java.nio.{ByteBuffer, ByteOrder}

/**
 * Real image-container codec for the multimodal path: uncompressed
 * 24-bit BMP (BITMAPFILEHEADER + BITMAPINFOHEADER, BI_RGB) build +
 * validating parse in pure JVM bytes — the image sibling of
 * [[WavCodec]]. The 4-byte row-stride padding rule is the part a
 * fixed-offset fake would get wrong; the oracle prices it exactly.
 * Perceptual decode (JPEG/PNG entropy coding) stays out of scope — no
 * media libraries in this environment.
 */
object BmpCodec {

  /** Canonical 54-byte-header 24bpp BMP; payload bytes are laid into
   * stride-length rows, zero-padded at the tail. */
  def build(width: Int, pixelBytes: Array[Byte]): Array[Byte] = {
    val stride = ((width * 3 + 3) / 4) * 4
    val height = (pixelBytes.length + stride - 1) / stride
    val dataSize = stride * height
    val fileSize = 54 + dataSize
    val bb = ByteBuffer.allocate(fileSize).order(ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte)
      .putInt(fileSize).putShort(0).putShort(0).putInt(54)
    bb.putInt(40) // BITMAPINFOHEADER size
      .putInt(width).putInt(height)
      .putShort(1) // planes
      .putShort(24) // bpp
      .putInt(0) // BI_RGB (uncompressed)
      .putInt(dataSize)
      .putInt(2835).putInt(2835) // 72 DPI
      .putInt(0).putInt(0) // palette
    bb.put(pixelBytes) // remainder of the buffer is the zero padding
    bb.array()
  }

  final case class BmpInfo(width: Int, height: Int, bpp: Int, stride: Int,
      dataBytes: Int, fileBytes: Int, pixelMd5: String)

  /** Parse + validate; throws on malformed input. */
  def parse(bytes: Array[Byte]): BmpInfo = {
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M', "not a BMP")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    bb.position(2)
    val fileSize = bb.getInt
    require(fileSize == bytes.length, s"file size $fileSize != ${bytes.length}")
    bb.getInt // reserved
    val dataOffset = bb.getInt
    val infoSize = bb.getInt
    require(infoSize == 40, s"not BITMAPINFOHEADER (size $infoSize)")
    val width = bb.getInt
    val height = bb.getInt
    require(bb.getShort == 1, "planes != 1")
    val bpp = bb.getShort.toInt
    require(bb.getInt == 0, "compressed BMP unsupported")
    val dataSize = bb.getInt
    val stride = ((width * bpp / 8) + 3) / 4 * 4
    require(dataSize == stride * height, s"data size $dataSize != stride*height")
    require(dataOffset + dataSize == bytes.length, "pixel array bounds")
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(bytes, dataOffset, dataSize)
    BmpInfo(width, height, bpp, stride, dataSize, bytes.length,
      md.digest().map("%02x".format(_)).mkString)
  }
}
