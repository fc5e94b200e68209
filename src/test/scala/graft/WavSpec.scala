package graft

import graft.pipeline.WavCodec
import org.scalatest.funsuite.AnyFunSuite

/**
 * WAV/RIFF codec: build→parse roundtrip, and proof the parser is a real
 * chunk walker — foreign chunks (with odd-size padding) are skipped,
 * truncation and bad magic are rejected.
 */
class WavSpec extends AnyFunSuite {

  private val pcm = Array.tabulate(1000)(i => (i % 251).toByte)

  test("build/parse roundtrip recovers format fields and payload hash") {
    val wav = WavCodec.build(11000, 1, 8, pcm)
    val info = WavCodec.parse(wav)
    assert(info.sampleRate === 11000)
    assert(info.channels === 1)
    assert(info.bits === 8)
    assert(info.nSamples === 1000L)
    assert(info.durationMs === 1000L * 1000 / 11000)
    assert(info.fileBytes === 44 + 1000)
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(pcm).map("%02x".format(_)).mkString
    assert(info.pcmMd5 === md5)
  }

  test("16-bit stereo sample accounting") {
    val bytes = Array.tabulate(1600)(_.toByte) // 400 frames * 2ch * 2B
    val info = WavCodec.parse(WavCodec.build(8000, 2, 16, bytes))
    assert(info.nSamples === 400L)
    assert(info.durationMs === 400L * 1000 / 8000)
  }

  test("parser walks past foreign chunks (with RIFF odd-size padding)") {
    val wav = WavCodec.build(9000, 1, 8, pcm)
    // splice a 5-byte LIST chunk (odd size → 1 pad byte) before fmt
    val extra = "LIST".getBytes("US-ASCII") ++
      Array[Byte](5, 0, 0, 0) ++ Array[Byte](1, 2, 3, 4, 5) ++ Array[Byte](0)
    val spliced = java.nio.ByteBuffer
      .allocate(wav.length + extra.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    spliced.put(wav, 0, 12) // RIFF header
    spliced.putInt(4, wav.length - 8 + extra.length) // patch RIFF size (offset 4)
    spliced.put(extra).put(wav, 12, wav.length - 12)
    val info = WavCodec.parse(spliced.array())
    assert(info.sampleRate === 9000)
    assert(info.nSamples === pcm.length.toLong)
  }

  test("malformed input is rejected") {
    val wav = WavCodec.build(8000, 1, 8, pcm)
    intercept[IllegalArgumentException](WavCodec.parse(wav.take(wav.length - 1)))
    intercept[IllegalArgumentException](WavCodec.parse("JUNK".getBytes ++ wav.drop(4)))
    intercept[IllegalArgumentException](WavCodec.parse(wav.take(20)))
  }
}
