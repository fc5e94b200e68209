package graft

import graft.functions.WinnowOps
import graft.pipeline.TextOps
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.scalatest.funsuite.AnyFunSuite

/**
 * Winnowing fingerprints: the single-pass rolling-hash + deque
 * implementation is checked against a naive quadratic reference
 * (explicit k-gram polynomial, explicit per-window min), and against the
 * SIGMOD'03 guarantee — any shared substring of length ≥ w + k − 1
 * yields at least one shared fingerprint.
 */
object WinnowRef {
  def fingerprints(s: String, k: Int, w: Int): Seq[Long] = {
    val grams = s.getBytes("UTF-8").map(_ & 0xffL).sliding(k).toSeq
      .filter(_.length == k)
      .map(_.foldLeft(0L)((acc, c) => acc * 131L + c))
    grams.sliding(w).filter(_.length == w).map(_.min).toSeq.distinct
  }
}

class WinnowSpec extends AnyFunSuite {
  private val k = TextOps.winnowK
  private val w = TextOps.winnowW

  private def fast(s: String): Seq[Long] =
    WinnowOps.fingerprints(UTF8String.fromString(s), k, w).toLongArray().toSeq

  test("matches the naive reference on hand examples") {
    for (s <- Seq(
      "the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaaaaaaaaaa",
      "0123456789ab",
      "spark native analytics engine for log topics"))
      assert(fast(s) == WinnowRef.fingerprints(s, k, w), s"mismatch on '$s'")
  }

  test("too-short input yields no fingerprints") {
    assert(fast("") == Seq.empty)
    assert(fast("a" * (k + w - 2)) == Seq.empty)
    assert(fast("abcdefghijk").size == 1) // exactly k + w - 1 chars: one window
  }

  test("guarantee: shared substring of length k + w - 1 shares a fingerprint") {
    val common = "common substring here"
    val a = "left padding text then " + common + " and trailing a"
    val b = "totally different opening, " + common + ", other tail"
    assert(fast(a).toSet.intersect(fast(b).toSet).nonEmpty)
  }
}

object WinnowProps extends Properties("WinnowOps") {
  private val k = TextOps.winnowK
  private val w = TextOps.winnowW
  // the normalized alphabet the engine feeds it: a-z, 0-9, space
  private val normChar: Gen[Char] =
    Gen.frequency((26, Gen.alphaLowerChar), (6, Gen.numChar), (8, Gen.const(' ')))
  private val normString: Gen[String] =
    Gen.chooseNum(0, 120).flatMap(n => Gen.stringOfN(n, normChar))

  property("equals naive quadratic reference") = forAll(normString) { s =>
    WinnowOps.fingerprints(UTF8String.fromString(s), k, w).toLongArray().toSeq ==
      WinnowRef.fingerprints(s, k, w)
  }
}
