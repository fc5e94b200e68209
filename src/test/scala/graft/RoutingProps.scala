package graft

import graft.functions.Murmur3x86
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/**
 * ScalaCheck properties for the routing/hash-ring algebra (SURVEY §5 test
 * plan): hash stability, ring-range bounds, and even-split coverage of the
 * 16-bit Key_Shared ring (KeySharedPolicy.java:40 — range size 2<<15).
 */
object RoutingProps extends Properties("Routing") {

  private val keys: Gen[String] = Gen.asciiPrintableStr
  private val seeds: Gen[Int] = Gen.chooseNum(Int.MinValue, Int.MaxValue)

  property("hash is deterministic") = forAll(keys, seeds) { (k, s) =>
    val b = k.getBytes("UTF-8")
    Murmur3x86.hashBytes(b, s) == Murmur3x86.hashBytes(b.clone(), s)
  }

  property("positive() is non-negative") = forAll(keys, seeds) { (k, s) =>
    Murmur3x86.positive(k.getBytes("UTF-8"), s) >= 0
  }

  property("sticky bucket lands on the 16-bit ring") = forAll(keys) { k =>
    val bucket = Murmur3x86.positive(k.getBytes("UTF-8"), 0) % 65536
    bucket >= 0 && bucket < 65536
  }

  /** The even ranges cover [0, 65536) exactly once — same arithmetic as
   * Routing.evenRanges without needing a SparkSession. */
  property("even ranges partition the ring") =
    forAll(Gen.chooseNum(1, 64)) { consumers =>
      val size = 65536
      val ranges = (0 until consumers).map { i =>
        (i * size / consumers, (i + 1) * size / consumers - 1)
      }
      val covered = ranges.map { case (lo, hi) => hi - lo + 1 }.sum
      val contiguous = ranges.sliding(2).forall {
        case Seq((_, hi), (lo2, _)) => lo2 == hi + 1
        case _ => true
      }
      Prop(covered == size && ranges.head._1 == 0 &&
        ranges.last._2 == size - 1 && contiguous)
    }

  /** Keyed routing is uniform-ish: over many random keys no partition of 8
   * takes more than twice its fair share (a loose bound — catches
   * byte-order/masking bugs that collapse the distribution). */
  property("key-hash routing spreads keys") =
    forAll(Gen.listOfN(400, Gen.uuid)) { ids =>
      val parts = ids.map(u =>
        Murmur3x86.positive(u.toString.getBytes("UTF-8"), 0) % 8)
      val maxShare = parts.groupBy(identity).values.map(_.size).max
      Prop(maxShare <= 400 / 8 * 2)
    }
}
