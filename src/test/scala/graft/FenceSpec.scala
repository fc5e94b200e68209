package graft

import graft.operators.Routing
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** R12 fence rules on hand fixtures the r12 query's corpus slice cannot
 * isolate: a DEPARTED consumer must drop out of recentlyJoinedConsumers
 * (removeConsumer :245-246) — it neither fences deliveries nor drags the
 * replay clamp down to its join position. */
class FenceSpec extends AnyFunSuite {
  import TestSpark._

  test("a leaver who joined past mark-delete neither fences nor clamps") {
    import TestSpark.spark
    import spark.implicits._
    // A owns the ring from 0; B joins at 50 (PAST mark-delete 30) taking
    // the low half; B leaves at 60 (A re-absorbs); C joins at 80 taking
    // the low half again. B's unacked tail (offset >= 55) replays to C.
    val membership = Seq((0L, "join", "consumer-A"),
      (50L, "join", "consumer-B"), (60L, "leave", "consumer-B"),
      (80L, "join", "consumer-C"))
    // keys landing in the LOW half of the ring (B's epoch-1 range, C's
    // final range); offsets span every epoch
    val lowKeys = (0 to 50).map(_.toString)
      .filter(k => graft.functions.Murmur3x86
        .positive(k.getBytes("UTF-8"), 0) % 65536 <= 32767)
    val env = (0L until 100L).map(off =>
      (off, lowKeys((off % lowKeys.size).toInt)))
      .toDF("msg_offset", "key")
      .withColumn("ordering_key", lit(null).cast("binary"))
    val got = Routing.fencedDispatch(env, membership, leaver = "consumer-B",
      unackedMinOffset = 55L, markDelete = 30L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3)))
    // B's normal messages [50, 55) must be DELIVERED even though B
    // joined past mark-delete — B left, so it is no longer in
    // recentlyJoinedConsumers and cannot fence its own past deliveries
    val bNormal = got.filter(t => t._2 == "consumer-B" && t._3 == "normal")
    assert(bNormal.nonEmpty && bNormal.forall(_._4 == "delivered"))
    // replays to C (recently joined at 80): the clamp is min over
    // PRESENT recent joiners = C's own 80, NOT departed B's 50 — so
    // replayed offsets in [55, 60) (< 80) are DELIVERED
    val cReplay = got.filter(t => t._2 == "consumer-C" && t._3 == "replay")
    assert(cReplay.nonEmpty && cReplay.forall(_._4 == "delivered"))
    // C's normal traffic (epoch 3, offsets >= 80 >= its join) stays held
    val cNormal = got.filter(t => t._2 == "consumer-C" && t._3 == "normal")
    assert(cNormal.nonEmpty && cNormal.forall(_._4 == "held"))
  }
}
