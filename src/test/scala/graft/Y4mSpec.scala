package graft

import graft.pipeline.Y4mCodec
import org.scalatest.funsuite.AnyFunSuite

/** The Y4M (YUV4MPEG2) container codec: build/parse roundtrip, the
 * validating walker's rejections, and the exact-integer SAD shot
 * signal. */
class Y4mSpec extends AnyFunSuite {

  private def frame(fb: Int, v: Int): Array[Byte] =
    Array.fill(fb)(v.toByte)

  test("build → parse roundtrip preserves geometry, fps, and frames") {
    val fs = Seq(frame(12, 10), frame(12, 200), frame(12, 201))
    val bytes = Y4mCodec.build(4, 3, 25, 1, fs)
    val info = Y4mCodec.parse(bytes)
    assert(info.width === 4 && info.height === 3)
    assert(info.fpsNum === 25 && info.fpsDen === 1)
    assert(info.nFrames === 3 && info.frameBytes === 12)
    assert(info.fileBytes === bytes.length)
    assert(info.frames.map(_.toSeq) === fs.map(_.toSeq))
    // header is the documented ASCII line
    val header = new String(bytes.takeWhile(_ != '\n'.toByte), "US-ASCII")
    assert(header === "YUV4MPEG2 W4 H3 F25:1 Ip A1:1 Cmono")
  }

  test("the walker rejects malformed streams") {
    val ok = Y4mCodec.build(4, 2, 25, 1, Seq(frame(8, 1), frame(8, 2)))
    // truncated mid-frame
    intercept[IllegalArgumentException] {
      Y4mCodec.parse(ok.dropRight(3))
    }
    // FRAME marker corrupted
    val corrupt = ok.clone()
    val m = new String(ok, "US-ASCII").indexOf("FRAME")
    corrupt(m) = 'X'.toByte
    intercept[IllegalArgumentException] { Y4mCodec.parse(corrupt) }
    // a colorspace the model doesn't cover must be refused, not misread
    val c420 = ("YUV4MPEG2 W4 H2 F25:1 Ip A1:1 C420\n").getBytes("US-ASCII")
    intercept[IllegalArgumentException] { Y4mCodec.parse(c420) }
    // wrong magic
    intercept[IllegalArgumentException] {
      Y4mCodec.parse("JUNK W4 H2 F25:1\n".getBytes("US-ASCII"))
    }
    // build refuses a wrong-size frame
    intercept[IllegalArgumentException] {
      Y4mCodec.build(4, 2, 25, 1, Seq(frame(7, 1)))
    }
    // overflow-hostile geometry is rejected, never misparsed: 65536²
    // would wrap to 0 frame bytes and "parse" any stream of markers
    intercept[IllegalArgumentException] {
      Y4mCodec.parse(
        "YUV4MPEG2 W65536 H65536 F25:1 Ip A1:1 Cmono\n".getBytes("US-ASCII"))
    }
    // malformed numerics and F ratios throw the contract's exception,
    // not NumberFormatException/MatchError
    intercept[IllegalArgumentException] {
      Y4mCodec.parse("YUV4MPEG2 W4x H2 F25:1 Cmono\n".getBytes("US-ASCII"))
    }
    intercept[IllegalArgumentException] {
      Y4mCodec.parse("YUV4MPEG2 W4 H2 F25 Cmono\n".getBytes("US-ASCII"))
    }
    intercept[IllegalArgumentException] {
      Y4mCodec.parse("YUV4MPEG2 W4 H2 F25:1:0 Cmono\n".getBytes("US-ASCII"))
    }
  }

  test("frame-level parameters after FRAME are accepted up to the newline") {
    // the format permits `FRAME I…\n` (frame headers carry optional
    // space-introduced parameters); splice one into a built stream
    val ok = Y4mCodec.build(4, 2, 25, 1, Seq(frame(8, 1), frame(8, 2)))
    val text = new String(ok, "US-ASCII")
    val m = text.indexOf("FRAME\n")
    val withParams = ok.take(m + 5) ++ " Ip3".getBytes("US-ASCII") ++
      ok.drop(m + 5)
    val info = Y4mCodec.parse(withParams)
    assert(info.nFrames === 2)
    assert(info.frames.map(_.toSeq) === Seq(frame(8, 1), frame(8, 2)).map(_.toSeq))
    // but a parameter string not introduced by a space is malformed
    val glued = ok.take(m + 5) ++ "X".getBytes("US-ASCII") ++ ok.drop(m + 5)
    intercept[IllegalArgumentException] { Y4mCodec.parse(glued) }
    // and an unterminated FRAME header (newline lost at end) is rejected
    intercept[IllegalArgumentException] {
      Y4mCodec.parse(
        ("YUV4MPEG2 W4 H2 F25:1 Ip A1:1 Cmono\nFRAME I").getBytes("US-ASCII"))
    }
  }

  test("SAD is the exact per-byte |Δ| sum; cuts fire past mean 30") {
    val a = Array[Byte](0, 10, 20, 100.toByte)
    val b = Array[Byte](5, 10, 250.toByte, 90.toByte)
    // |0-5| + 0 + |20-250| + |100-90| = 5 + 230 + 10
    assert(Y4mCodec.sad(a, b) === 245L)
    // a hard scene cut: mean |Δ| = 245/4 > 30 ⇒ SAD > 30·4
    assert(Y4mCodec.sad(a, b) > 30L * 4)
    // a static pair is no cut
    assert(Y4mCodec.sad(a, a) === 0L)
  }
}
