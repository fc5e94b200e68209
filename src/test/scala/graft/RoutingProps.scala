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

  /** Dynamic auto-split (R6): after EVERY join/leave event, the ranges
   * exactly tile [0, 65536) — each bucket maps to exactly one consumer —
   * and consumers hold one contiguous range each
   * (HashRangeAutoSplitStickyKeyConsumerSelector invariant). */
  property("auto-split ranges tile the ring after every event") = {
    // membership scripts: joins of fresh consumers interleaved with leaves
    // of a uniformly chosen *present* consumer
    val script: Gen[Seq[(String, String)]] =
      Gen.listOf(Gen.chooseNum(0, 2)).map { moves =>
        var present = Vector.empty[String]
        var nextId = 0
        moves.flatMap { m =>
          if (m < 2) { // join twice as likely as leave
            val c = s"c$nextId"; nextId += 1; present :+= c
            Some("join" -> c)
          } else if (present.nonEmpty) {
            val c = present((m * 7919 + nextId) % present.size)
            present = present.filterNot(_ == c)
            Some("leave" -> c)
          } else None
        }
      }
    forAll(script) { events =>
      (1 to events.size).forall { n =>
        val ranges = graft.operators.Routing.autoSplitFold(events.take(n))
        val present = events.take(n).foldLeft(Set.empty[String]) {
          case (s, ("join", c)) => s + c
          case (s, (_, c)) => s - c
        }
        if (present.isEmpty) ranges.isEmpty
        else {
          val sorted = ranges.sortBy(_.lo)
          sorted.head.lo == 0 && sorted.last.hi == 65535 &&
            sorted.sliding(2).forall {
              case Seq(a, b) => b.lo == a.hi + 1
              case _ => true
            } &&
            sorted.map(_.consumer).toSet == present &&
            sorted.size == present.size // one contiguous range per consumer
        }
      }
    }
  }

  /** Exclusive (user-pinned) ranges, R7: whatever the request sequence,
   * the admitted table never overlaps; admission is all-or-nothing per
   * consumer; and a request is rejected IFF it is self-invalid or
   * conflicts with the already-admitted table
   * (HashRangeExclusiveStickyKeyConsumerSelector add validation). */
  property("exclusive ranges: admitted table is conflict-free, admission is exact") = {
    val range: Gen[(Int, Int)] = for {
      a <- Gen.chooseNum(0, 65535); b <- Gen.chooseNum(0, 65535)
      flip <- Gen.prob(0.9) // mostly valid (lo <= hi), sometimes inverted
    } yield if (flip) (math.min(a, b), math.max(a, b)) else (math.max(a, b) + 1, math.min(a, b))
    val requests: Gen[Seq[(String, Seq[(Int, Int)])]] =
      Gen.listOf(Gen.listOfN(2, range)).map(_.zipWithIndex.map {
        case (rs, i) => s"c$i" -> rs.take(1 + i % 2)
      })
    forAll(requests) { reqs =>
      val admitted = graft.operators.Routing.exclusiveRangesFold(reqs)
      val sorted = admitted.sortBy(_.lo)
      val noOverlap = sorted.sliding(2).forall {
        case Seq(a, b) => a.hi < b.lo
        case _ => true
      }
      val allOrNothing = reqs.forall { case (c, rs) =>
        val mine = admitted.filter(_.consumer == c)
        mine.isEmpty || mine.map(r => (r.lo, r.hi)).sortBy(_._1) == rs.sortBy(_._1)
      }
      // replay: each request must be admitted iff valid against the
      // table admitted BEFORE it (prefix-fold equivalence)
      val admissionExact = reqs.indices.forall { i =>
        val before = graft.operators.Routing.exclusiveRangesFold(reqs.take(i))
        val after = graft.operators.Routing.exclusiveRangesFold(reqs.take(i + 1))
        val (c, rs) = reqs(i)
        val srt = rs.sortBy(_._1)
        val selfOk = rs.forall { case (lo, hi) => lo <= hi } &&
          srt.zip(srt.drop(1)).forall { case (x, y) => x._2 < y._1 }
        val conflict = rs.exists { case (lo, hi) =>
          before.exists(e => math.max(lo, e.lo) <= math.min(hi, e.hi)) }
        val got = after.exists(_.consumer == c)
        got == (selfOk && !conflict)
      }
      Prop(noOverlap && allOrNothing && admissionExact)
    }
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

  /** R12 epoch tables: membership events at non-decreasing offsets →
   * the live spans tile [first offset, ∞) in event order with no
   * overlap, every epoch's ranges tile the ring for its present set,
   * and same-offset successors supersede (no zero-width epoch). */
  property("fence epoch tables tile offsets and the ring") = {
    val script: Gen[Seq[(Long, String, String)]] =
      Gen.listOf(Gen.zip(Gen.chooseNum(0L, 5L), Gen.chooseNum(0, 2)))
        .map { moves =>
          var present = Vector.empty[String]
          var nextId = 0
          var off = 0L
          moves.flatMap { case (gap, m) =>
            off += gap // gap 0 ⇒ same-offset event (supersession case)
            if (m < 2) {
              val c = s"c$nextId"; nextId += 1; present :+= c
              Some((off, "join", c))
            } else if (present.nonEmpty) {
              val c = present((m * 7919 + nextId) % present.size)
              present = present.filterNot(_ == c)
              Some((off, "leave", c))
            } else None
          }
        }
    forAll(script) { events =>
      val eps = graft.operators.Routing.epochTables(events)
      val spansOk = eps.forall { case (_, f, u, _) => f < u } &&
        eps.sliding(2).forall {
          case Seq((_, _, u1, _), (_, f2, _, _)) => u1 == f2
          case _ => true
        } &&
        (eps.isEmpty || (eps.head._2 == events.head._1 &&
          eps.last._3 == Long.MaxValue))
      val ringsOk = eps.forall { case (i, _, _, ranges) =>
        val present = events.take(i + 1)
          .foldLeft(Set.empty[String]) {
            case (s, (_, "join", c)) => s + c
            case (s, (_, _, c)) => s - c
          }
        if (present.isEmpty) ranges.isEmpty
        else {
          val sorted = ranges.sortBy(_.lo)
          sorted.head.lo == 0 && sorted.last.hi == 65535 &&
            sorted.sliding(2).forall {
              case Seq(a, b) => b.lo == a.hi + 1
              case _ => true
            } && sorted.map(_.consumer).toSet == present
        }
      }
      Prop(spansOk && ringsOk)
    }
  }

  /** R12 fence divider: never above the consumer's own join position;
   * replay reads clamp DOWN to the oldest recently-joined position
   * (#23795), never up; without recently-joined consumers the divider
   * is the consumer's own join either way. */
  property("fence divider clamps down and only for replays") =
    forAll(Gen.chooseNum(0L, 1000L), Gen.option(Gen.chooseNum(0L, 1000L))) {
      (join, minRecent) =>
        val n = graft.operators.Routing.fenceDivider(isReplay = false,
          join, minRecent)
        val r = graft.operators.Routing.fenceDivider(isReplay = true,
          join, minRecent)
        Prop(n == join && r <= join &&
          r == math.min(minRecent.getOrElse(join), join))
    }
}
