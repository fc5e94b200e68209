package graft

import graft.schema.{CompatibilityStrategy, ProtoCompat, ProtoWire}
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** PROTOBUF_NATIVE wire codec: roundtrip, spec'd byte layout, zigzag,
 * unknown-field skip, truncation rejection, root-name compat rule. */
class ProtoWireSpec extends AnyFunSuite {

  private def codec = new ProtoWire.Codec

  test("known byte layout for a small record") {
    // k="ab" (field1, len 2), v=1.0 (field2), off=3 (field3, zigzag 6)
    val bytes = codec.encode("ab", 1.0, 3L)
    val expected = Array[Byte](
      0x0a, 0x02, 'a'.toByte, 'b'.toByte, // tag(1,2), len 2, "ab"
      0x11, 0, 0, 0, 0, 0, 0, -16, 0x3f, // tag(2,1), 1.0 LE (0x3FF0..00)
      0x18, 0x06) // tag(3,0), zigzag(3)=6
    assert(bytes.sameElements(expected),
      bytes.map(b => f"$b%02x").mkString(" "))
  }

  test("roundtrip preserves fields and fills the reader default") {
    val d = codec.decode(codec.encode("key-7", 3.25, 123456789L))
    assert(d.k == "key-7" && d.v == 3.25 && d.off == 123456789L)
    assert(d.region == "unset" && d.skipped == 0)
  }

  test("newer writer's unknown field is skipped, not misparsed") {
    val d = codec.decode(codec.encodeNewer("k", 2.5, 42L, extra = 999L))
    assert(d.k == "k" && d.v == 2.5 && d.off == 42L && d.skipped == 1)
  }

  test("negative offsets zigzag correctly") {
    val d = codec.decode(codec.encode("n", 0.0, -5L))
    assert(d.off == -5L)
    assert(ProtoWire.zigzag(-1L) == 1L && ProtoWire.zigzag(1L) == 2L)
    assert(ProtoWire.unzigzag(ProtoWire.zigzag(Long.MinValue)) == Long.MinValue)
  }

  test("truncated records are rejected") {
    val full = codec.encode("payload", 1.5, 1000L)
    for (cut <- Seq(1, full.length / 2, full.length - 1))
      intercept[IllegalArgumentException] { codec.decode(full.take(cut)) }
  }

  test("compat pins only the root message name") {
    import ProtoCompat.ProtoDescriptor
    val v0 = ProtoDescriptor("graft.Msg", Set(1, 2, 3))
    val evolved = ProtoDescriptor("graft.Msg", Set(1, 2, 3, 4, 9))
    val renamed = ProtoDescriptor("graft.MsgV2", Set(1, 2, 3))
    for (st <- CompatibilityStrategy.all) {
      val expEvolved = st.name != "ALWAYS_INCOMPATIBLE"
      val expRenamed = st.name == "ALWAYS_COMPATIBLE"
      assert(ProtoCompat.isCompatible(Seq(v0), evolved, st) == expEvolved, st.name)
      assert(ProtoCompat.isCompatible(Seq(v0), renamed, st) == expRenamed, st.name)
    }
  }
}

object ProtoWireProps extends Properties("ProtoWire") {

  private val keys: Gen[String] = Gen.asciiPrintableStr
  private val offs: Gen[Long] = Gen.chooseNum(Long.MinValue, Long.MaxValue)
  private val doubles: Gen[Double] = Gen.chooseNum(-1e12, 1e12)

  property("roundtrip any (k, v, off)") = forAll(keys, doubles, offs) { (k, v, off) =>
    val c = new ProtoWire.Codec
    val d = c.decode(c.encode(k, v, off))
    Prop(d.k == k && d.off == off &&
      java.lang.Double.doubleToLongBits(d.v) == java.lang.Double.doubleToLongBits(v))
  }

  property("zigzag is a bijection on the samples") = forAll(offs) { n =>
    ProtoWire.unzigzag(ProtoWire.zigzag(n)) == n
  }

  property("varintLen matches encoded size") = forAll(offs) { n =>
    val w = new ProtoWire.Writer(16)
    w.writeVarint(n)
    w.toBytes.length == ProtoWire.varintLen(n)
  }
}
