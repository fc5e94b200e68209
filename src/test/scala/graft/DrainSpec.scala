package graft

import graft.functions.Murmur3x86
import graft.operators.{DrainingHashes, Routing}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * R13 — PIP-379 draining hashes. The operator's closed-form relational
 * rules are checked against an INDEPENDENT discrete-event simulation of
 * the tracker (pending maps, per-hash refcounted entries, a blocked
 * queue retried on unblock/membership events — the DrainingHashesTracker
 * control flow, not the operator's column algebra), on pseudo-random
 * logs under BOTH cycle shapes: the leaver's span returning to the
 * draining consumer (lazy rule-6 removal) and being absorbed elsewhere
 * (entries outliving the cycle). Plus the PIP-379 invariant: no bucket
 * is ever delivered to a consumer other than its draining owner before
 * the drain completes.
 */
class DrainSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def bucketOf(key: String): Int =
    Murmur3x86.positive(key.getBytes("UTF-8"), 0) % 65536

  /** The independent reference: a seq-ordered event-loop simulation. */
  private def simulate(msgs: Seq[(Long, String)],
      membership: Seq[(Long, String, String)], joiner: String,
      ackDelayUnit: Long, retainFrom: Long)
      : Map[Long, (String, Long, Boolean, Boolean)] = {
    val joinIdx = membership.indexWhere(e => e._2 == "join" && e._3 == joiner)
    val leaveIdx = membership.indexWhere(e => e._2 == "leave" && e._3 == joiner)
    val f1 = membership(joinIdx)._1
    val f2 = membership(leaveIdx)._1
    def tableAt(i: Int): Seq[Routing.HashRange] =
      Routing.autoSplitFold(membership.take(i + 1).map(e => (e._2, e._3)))
    def ownerIn(t: Seq[Routing.HashRange], b: Int): String =
      t.find(r => r.lo <= b && b <= r.hi).get.consumer
    val t0 = tableAt(joinIdx - 1); val t1 = tableAt(joinIdx)
    val t2 = tableAt(leaveIdx)
    def ownerAt(seq: Long, b: Int): String =
      if (seq < f1) ownerIn(t0, b)
      else if (seq < f2) ownerIn(t1, b) else ownerIn(t2, b)

    val byBucket = msgs.map { case (o, k) => (o, bucketOf(k)) }
    // tracker state
    var entries = Map.empty[Int, (String, Int, Long)] // bucket → (owner, ref, done)
    var blocked = Map.empty[Int, Vector[Long]]        // bucket → queued offsets
    var joinerPending = Vector.empty[Long]            // unacked tail offsets
    val out = scala.collection.mutable.Map
      .empty[Long, (String, Long, Boolean, Boolean)]

    def attempt(o: Long, b: Int, seq: Long, wasBlocked: Boolean,
        replayed: Boolean): Unit = {
      val owner = ownerAt(seq, b)
      entries.get(b) match {
        case Some((eOwner, _, _)) if eOwner != owner =>
          blocked = blocked.updated(b, blocked.getOrElse(b, Vector.empty) :+ o)
        case other =>
          if (other.isDefined) entries -= b // rule 6: lazy un-track
          out(o) = (owner, seq, wasBlocked, replayed)
          // PIP-379 replays EVERYTHING the closing consumer still holds
          // unacked — blocked-then-delivered included; the proxy is
          // uniform in the receive seq
          if (owner == joiner && seq < f2 && seq >= retainFrom)
            joinerPending :+= o
      }
    }
    def release(b: Int, seq: Long): Unit = {
      val queued = blocked.getOrElse(b, Vector.empty)
      blocked -= b // attempt() may re-queue, so clear BEFORE retrying
      queued.foreach(o =>
        attempt(o, b, seq, wasBlocked = true, replayed = false))
    }

    // phase-A acks that feed the tracker, keyed by ack seq
    val ackAt = byBucket.filter(_._1 < f1)
      .groupBy { case (o, _) => o + (o % 5 + 1) * ackDelayUnit }
    val seqs = (byBucket.map(_._1) ++ ackAt.keys ++ Seq(f1, f2))
      .distinct.sorted
    for (s <- seqs) {
      // 1. acks land first (the declared tie rule)
      ackAt.getOrElse(s, Seq.empty).foreach { case (_, b) =>
        entries.get(b).foreach { case (ow, ref, done) =>
          if (ref == 1) { entries -= b; release(b, s) }
          else entries = entries.updated(b, (ow, ref - 1, done))
        }
      }
      // 2. membership transitions
      if (s == f1) {
        // register draining entries: pending phase-A messages on spans
        // whose owner changed
        val changed = DrainingHashes.ownerChanges(t0, t1)
        val pend = byBucket.filter { case (o, b) =>
          o < f1 && o + (o % 5 + 1) * ackDelayUnit > f1 &&
            changed.exists(c => c._1 <= b && b <= c._2)
        }
        pend.groupBy(_._2).foreach { case (b, ms) =>
          entries += b -> ((ownerIn(t0, b), ms.size,
            ms.map { case (o, _) => o + (o % 5 + 1) * ackDelayUnit }.max))
        }
      }
      if (s == f2) {
        // the leaver departs: its unacked tail replays to the new table;
        // blocked hashes retry (reads are rescheduled on removal)
        val tail = joinerPending; joinerPending = Vector.empty
        tail.foreach { o =>
          val b = byBucket.find(_._1 == o).get._2
          val prev = out(o)
          assert(prev._1 == joiner)
          out(o) = (ownerAt(s, b), s, prev._3, true)
        }
        blocked.keys.toSeq.foreach(b => release(b, s))
      }
      // 3. publishes dispatch last
      byBucket.filter(_._1 == s).foreach { case (o, b) =>
        attempt(o, b, s, wasBlocked = false, replayed = false)
      }
    }
    // every ack seq is in `seqs`, so each entry's refcount hit zero (and
    // released its queue) inside the loop — nothing may still be waiting
    assert(blocked.isEmpty && joinerPending.isEmpty,
      s"simulation ended with work in flight: $blocked / $joinerPending")
    out.toMap
  }

  private def runOperator(msgs: Seq[(Long, String)],
      membership: Seq[(Long, String, String)], joiner: String,
      ackDelayUnit: Long, retainFrom: Long)
      : Map[Long, (String, Long, Boolean, Boolean)] = {
    val df = msgs.toDF("msg_offset", "key")
      .withColumn("ordering_key", lit(null).cast("binary"))
    DrainingHashes.drainCycle(df, membership, joiner, ackDelayUnit,
        retainFrom)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(3), r.getLong(4), r.getBoolean(5), r.getBoolean(6))))
      .toMap
  }

  private val cycleBack = Seq( // leaver's span returns to the old owner
    (0L, "join", "A"), (0L, "join", "B"),
    (400L, "join", "X"), (700L, "leave", "X"))
  private val cycleAway = Seq( // mid-cycle leave: span absorbed elsewhere
    (0L, "join", "A"), (0L, "join", "B"),
    (400L, "join", "X"), (550L, "leave", "B"), (700L, "leave", "X"))

  private def randomMsgs(seed: Long, n: Int, keys: Int = 200)
      : Seq[(Long, String)] = {
    val lcg = new Lcg(seed)
    (0 until n).map(i => (i * 1000L / n + lcg.next(3), s"k${lcg.next(keys)}"))
      .distinctBy(_._1)
  }

  test("operator matches the discrete-event simulation (span returns)") {
    var sawBlockedReplay = false
    for (seed <- Seq(0x11L, 0x22L, 0x33L)) {
      val msgs = randomMsgs(seed, 300)
      val sim = simulate(msgs, cycleBack, "X", 80L, 550L)
      val got = runOperator(msgs, cycleBack, "X", 80L, 550L)
      assert(got.keySet === sim.keySet)
      got.foreach { case (o, v) => assert(v === sim(o), s"offset $o") }
      // the branch the r8 advisory was about: a message BLOCKED at the
      // join, released to the joiner post-drain, and still unacked at
      // its departure must replay — the fixtures must exercise it
      sawBlockedReplay ||= got.values.exists(v => v._3 && v._4)
    }
    assert(sawBlockedReplay, "no blocked-then-replayed delivery exercised")
  }

  test("operator matches the simulation (span absorbed elsewhere: " +
    "entries outlive the cycle, b2 blocks)") {
    for (seed <- Seq(0x44L, 0x55L)) {
      // few keys + long ack tails so some buckets drain past the leave
      val msgs = randomMsgs(seed, 300, keys = 40)
      val sim = simulate(msgs, cycleAway, "X", 100L, 550L)
      val got = runOperator(msgs, cycleAway, "X", 100L, 550L)
      got.foreach { case (o, v) => assert(v === sim(o), s"offset $o") }
      // the shape this membership exists to exercise: deliveries blocked
      // PAST the leave (entry owner B is gone; span went to A)
      assert(got.exists { case (o, (_, ds, wb, _)) => wb && ds > 700L })
    }
  }

  test("PIP-379 invariant: no delivery to a non-draining consumer " +
    "before its bucket drains") {
    for ((cycle, seed) <- Seq((cycleBack, 0x66L), (cycleAway, 0x77L))) {
      val msgs = randomMsgs(seed, 400)
      val byBucket = msgs.map { case (o, k) => o -> bucketOf(k) }.toMap
      // rebuild the registered entries exactly as the operator defines
      val t0 = Routing.autoSplitFold(
        cycle.takeWhile(_._3 != "X").map(e => (e._2, e._3)))
      val t1 = Routing.autoSplitFold(
        cycle.take(cycle.indexWhere(_._3 == "X") + 1).map(e => (e._2, e._3)))
      val changed = DrainingHashes.ownerChanges(t0, t1)
      val entry = msgs.flatMap { case (o, k) =>
        val b = bucketOf(k)
        val ack = o + (o % 5 + 1) * 80L
        if (o < 400L && ack > 400L &&
          changed.exists(c => c._1 <= b && b <= c._2))
          Some(b -> ((t0.find(r => r.lo <= b && b <= r.hi).get.consumer, ack)))
        else None
      }.groupBy(_._1).map { case (b, xs) =>
        b -> ((xs.head._2._1, xs.map(_._2._2).max))
      }
      val got = runOperator(msgs, cycle, "X", 80L, 550L)
      got.foreach { case (o, (consumer, deliverSeq, _, _)) =>
        entry.get(byBucket(o)).foreach { case (owner, drainDone) =>
          assert(consumer == owner || deliverSeq >= drainDone,
            s"offset $o delivered to $consumer at $deliverSeq while " +
              s"$owner was draining until $drainDone")
        }
      }
    }
  }

  test("ownerChanges: boundary walk over two tilings") {
    val a = Seq(Routing.HashRange("p", 0, 32767),
      Routing.HashRange("q", 32768, 65535))
    val b = Seq(Routing.HashRange("r", 0, 16383),
      Routing.HashRange("p", 16384, 32767),
      Routing.HashRange("q", 32768, 65535))
    assert(DrainingHashes.ownerChanges(a, b) ===
      Seq((0, 16383, "p", "r")))
    assert(DrainingHashes.ownerChanges(a, a) === Seq.empty)
  }
}
