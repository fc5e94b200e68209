package graft

import graft.functions.Murmur3x86
import org.scalatest.funsuite.AnyFunSuite

/**
 * Pins Murmur3x86 to the public MurmurHash3 x86_32 test vectors (the
 * SMHasher / Appleby reference values), so the r2/r5 routing oracles —
 * whose DuckDB VALUES tables are generated from this hash — rest on an
 * independent ground truth, and parity with the reference's seed-0 scheme
 * (pulsar-client/.../impl/Murmur3Hash32.java:44 `hash & MAX_VALUE`)
 * is testable.
 */
class Murmur3Spec extends AnyFunSuite {

  private def h(s: String, seed: Int): Int =
    Murmur3x86.hashBytes(s.getBytes("UTF-8"), seed)

  test("public murmur3 x86_32 vectors, seed 0") {
    assert(h("", 0) === 0)
    assert(h("hello", 0) === 613153351)
    assert(h("hello, world", 0) === 345750399)
    assert(h("abc", 0) === 0xb3dd93fa) // == -1277324294 signed
  }

  test("public murmur3 x86_32 vectors, nonzero seeds") {
    assert(h("", 1) === 0x514e28b7)
    assert(h("", 0xffffffff) === 0x81f16f39)
    assert(h("test", 0x9747b28c) === 0x704b81dc)
    assert(h("Hello, world!", 0x9747b28c) === 0x24884cba)
    assert(h("The quick brown fox jumps over the lazy dog", 0x9747b28c) === 0x2fa826cd)
    assert(h("aaaa", 0x9747b28c) === 0x5a97808a)
  }

  test("positive() masks the sign bit like the reference router") {
    // Murmur3Hash32.java:41 applies `& Integer.MAX_VALUE` before the modulo.
    assert(Murmur3x86.positive("abc".getBytes("UTF-8"), 0) ===
      (0xb3dd93fa & Int.MaxValue))
    assert(Murmur3x86.positive("0".getBytes("UTF-8"), 0) === 1383186559)
    assert(Murmur3x86.positive("1".getBytes("UTF-8"), 0) === 337030291)
    assert(Murmur3x86.positive("2".getBytes("UTF-8"), 0) === 19522071)
    assert(Murmur3x86.positive("14".getBytes("UTF-8"), 0) === 398452281)
  }

  test("fixture keys route stably: partition = positive(key) % n") {
    // The values the r2 oracle's VALUES table must contain for n=6.
    val expected = Map("0" -> 1383186559 % 6, "1" -> 337030291 % 6,
      "2" -> 19522071 % 6, "14" -> 398452281 % 6)
    expected.foreach { case (k, p) =>
      assert(Murmur3x86.positive(k.getBytes("UTF-8"), 0) % 6 === p)
    }
  }
}
