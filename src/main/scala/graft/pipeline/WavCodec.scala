package graft.pipeline

import java.nio.{ByteBuffer, ByteOrder}

/**
 * A REAL container-format codec for the multimodal path: canonical PCM
 * WAV (RIFF) build + parse in pure JVM bytes — no media libraries
 * needed, unlike perceptual codecs (JPEG/H.264), which remain stubbed
 * behind [[Multimodal.decodeStub]]. The parser is an actual chunk
 * walker (4CC + little-endian size, even-byte padding, arbitrary chunk
 * order, unknown chunks skipped), not a fixed-offset peek — the
 * WavSpec proves it by inserting foreign chunks and truncating files.
 */
object WavCodec {

  /** Canonical 44-byte-header PCM WAV. */
  def build(sampleRate: Int, channels: Int, bitsPerSample: Int,
      pcm: Array[Byte]): Array[Byte] = {
    val byteRate = sampleRate * channels * bitsPerSample / 8
    val blockAlign = channels * bitsPerSample / 8
    val bb = ByteBuffer.allocate(44 + pcm.length).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + pcm.length)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(byteRate)
      .putShort(blockAlign.toShort)
      .putShort(bitsPerSample.toShort)
    bb.put("data".getBytes("US-ASCII")).putInt(pcm.length).put(pcm)
    bb.array()
  }

  final case class WavInfo(sampleRate: Int, channels: Int, bits: Int,
      nSamples: Long, durationMs: Long, pcmMd5: String, fileBytes: Int)

  private def fourCC(bb: ByteBuffer): String = {
    val b = new Array[Byte](4)
    bb.get(b)
    new String(b, "US-ASCII")
  }

  /** Parse by walking RIFF chunks; throws on malformed input. */
  def parse(bytes: Array[Byte]): WavInfo = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 12 && fourCC(bb) == "RIFF", "not a RIFF file")
    val riffSize = bb.getInt
    require(riffSize == bytes.length - 8, s"RIFF size $riffSize != ${bytes.length - 8}")
    require(fourCC(bb) == "WAVE", "not a WAVE form")
    var sampleRate = -1
    var channels = -1
    var bits = -1
    var dataLen = -1
    var dataOff = -1
    while (bb.remaining() >= 8) {
      val id = fourCC(bb)
      val size = bb.getInt
      require(size >= 0 && bb.remaining() >= size, s"truncated chunk $id")
      id match {
        case "fmt " =>
          val fmt = bb.getShort
          require(fmt == 1, s"not PCM (format $fmt)")
          channels = bb.getShort
          sampleRate = bb.getInt
          bb.getInt // byte rate
          bb.getShort // block align
          bits = bb.getShort
          bb.position(bb.position() + (size - 16))
        case "data" =>
          dataLen = size
          dataOff = bb.position()
          bb.position(bb.position() + size)
        case _ => // unknown chunk: skip payload
          bb.position(bb.position() + size)
      }
      if (size % 2 == 1 && bb.remaining() > 0) bb.position(bb.position() + 1) // RIFF pad
    }
    require(sampleRate > 0 && dataLen >= 0, "missing fmt /data chunk")
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(bytes, dataOff, dataLen)
    val nSamples = dataLen.toLong / (channels * bits / 8)
    WavInfo(sampleRate, channels, bits, nSamples,
      nSamples * 1000L / sampleRate,
      md.digest().map("%02x".format(_)).mkString, bytes.length)
  }
}
