package graft

import graft.pipeline.BmpCodec
import org.scalatest.funsuite.AnyFunSuite

/** BMP codec: roundtrip, the 4-byte row-stride rule, and rejection of
 * malformed files. */
class BmpSpec extends AnyFunSuite {

  test("roundtrip recovers geometry and padded-payload hash") {
    val px = Array.tabulate(1000)(i => (i % 253).toByte)
    val width = 17 // 17*3 = 51 -> stride 52 (padding actually exercised)
    val info = BmpCodec.parse(BmpCodec.build(width, px))
    assert(info.width === 17)
    assert(info.stride === 52)
    assert(info.height === (1000 + 51) / 52)
    assert(info.bpp === 24)
    assert(info.dataBytes === info.stride * info.height)
    assert(info.fileBytes === 54 + info.dataBytes)
    // hash covers payload + zero padding, deterministically
    val padded = px ++ Array.fill(info.dataBytes - px.length)(0.toByte)
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(padded).map("%02x".format(_)).mkString
    assert(info.pixelMd5 === md5)
  }

  test("stride-aligned width needs no padding") {
    val info = BmpCodec.parse(BmpCodec.build(16, Array.fill(48 * 3)(7.toByte))) // 16*3 = 48, already 4-aligned
    assert(info.stride === 48)
    assert(info.height === 3)
  }

  test("malformed input is rejected") {
    val ok = BmpCodec.build(16, Array.fill(100)(1.toByte))
    intercept[IllegalArgumentException](BmpCodec.parse(ok.take(ok.length - 1)))
    intercept[IllegalArgumentException](BmpCodec.parse("XX".getBytes ++ ok.drop(2)))
    intercept[IllegalArgumentException](BmpCodec.parse(ok.take(40)))
  }
}
