package graft

import graft.functions.{WireCodecs, ZlibCodec}
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/**
 * F15 codec: zlib deflate/inflate roundtrip identity — the property the
 * f15_compression oracle asserts end-to-end over the envelope payloads —
 * plus RFC 1950 framing spot checks (zlib header byte 0x78, Adler-32
 * trailer length) so "deflate" is provably the zlib wire format the
 * reference's CompressionCodecZLib produces, not a bare DEFLATE stream.
 */
class CodecSpec extends AnyFunSuite {

  test("roundtrip across compression levels and sizes") {
    val payloads = Seq(
      Array.emptyByteArray,
      "x".getBytes("UTF-8"),
      ("{\"amount_c\":123,\"origin\":\"p1\"}" * 1000).getBytes("UTF-8"),
      Array.tabulate(65536)(i => (i * 31 % 251).toByte))
    for (level <- Seq(1, 6, 9); p <- payloads)
      assert(ZlibCodec.inflate(ZlibCodec.deflate(p, level)).sameElements(p))
  }

  test("output is RFC 1950 zlib framing") {
    val out = ZlibCodec.deflate("hello, zlib".getBytes("UTF-8"), 6)
    // CMF byte: compression method 8 (deflate), 32K window → 0x78
    assert((out(0) & 0xff) === 0x78)
    // header (2) + at least one deflate block + Adler-32 trailer (4)
    assert(out.length >= 7)
  }

  test("compressible payloads shrink") {
    val repetitive = ("abcdefgh" * 4096).getBytes("UTF-8")
    assert(ZlibCodec.deflate(repetitive, 6).length < repetitive.length / 10)
  }

  test("truncated stream is rejected") {
    val full = ZlibCodec.deflate(Array.tabulate(1024)(_.toByte), 6)
    intercept[Exception] {
      ZlibCodec.inflate(full.take(full.length / 2))
    }
  }

  test("all five reference codecs roundtrip (incl. empty payloads)") {
    val payloads = Seq(
      Array.emptyByteArray,
      "x".getBytes("UTF-8"),
      ("{\"amount_c\":123,\"origin\":\"p1\"}" * 500).getBytes("UTF-8"),
      Array.tabulate(65536)(i => (i * 31 % 251).toByte))
    for (codec <- Seq("NONE", "LZ4", "ZLIB", "ZSTD", "SNAPPY"); p <- payloads) {
      val back = WireCodecs.decompress(codec,
        WireCodecs.compress(codec, p, 6), p.length)
      assert(back.sameElements(p), s"$codec failed on ${p.length}-byte payload")
    }
  }

  test("compressible payloads shrink under every real codec") {
    val repetitive = ("abcdefgh" * 4096).getBytes("UTF-8")
    for (codec <- Seq("LZ4", "ZLIB", "ZSTD", "SNAPPY"))
      assert(WireCodecs.compress(codec, repetitive, 6).length < repetitive.length / 4,
        s"$codec did not compress")
  }

  test("unknown codec is rejected") {
    intercept[IllegalArgumentException] {
      WireCodecs.compress("BROTLI", Array[Byte](1, 2, 3), 6)
    }
  }

  test("malformed payloads degrade to null per row, not a thrown scan") {
    val good = "payload".getBytes("UTF-8")
    for (codec <- Seq("LZ4", "ZLIB", "ZSTD", "SNAPPY")) {
      val garbage = Array.tabulate(64)(i => (i * 7 + 13).toByte)
      assert(WireCodecs.decompressOrNull(codec, garbage, good.length) == null,
        s"$codec should null out garbage bytes")
      val ok = WireCodecs.decompressOrNull(codec,
        WireCodecs.compress(codec, good, 6), good.length)
      assert(ok != null && ok.sameElements(good), s"$codec intact payload survives")
    }
    // unknown codec stays a programming error even on the lenient path
    intercept[IllegalArgumentException] {
      WireCodecs.decompressOrNull("BROTLI", good, good.length)
    }
  }
}

object CodecProps extends Properties("ZlibCodec") {
  private val bytesGen: Gen[Array[Byte]] =
    Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))

  property("roundtrip identity on arbitrary byte arrays") =
    forAll(bytesGen) { bytes =>
      ZlibCodec.inflate(ZlibCodec.deflate(bytes, 6)).sameElements(bytes)
    }
}
