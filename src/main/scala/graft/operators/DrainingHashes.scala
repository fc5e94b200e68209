package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * R13 — the PIP-379 DRAINING-HASHES fence, the snapshot's DEFAULT
 * Key_Shared ordering mechanism (reference: `pip/pip-379.md:73-280` and
 * `pulsar-broker/.../service/DrainingHashesTracker.java:47-140`):
 * when consumer hash ranges change, each PENDING (delivered, unacked)
 * message hash that moved away from its owner adds a draining entry
 * (hash → old owner) with a per-pending-message reference count; a
 * message for a draining hash is BLOCKED from its new owner until the
 * count drains to zero (each ack decrements; zero removes the entry and
 * unblocks), EXCEPT that a hash reassigned back to the draining
 * consumer itself is lazily un-tracked and delivers immediately
 * (`shouldBlockStickyKeyHash`, pip-379.md:266-281 rule 6). The invariant
 * the tracker enforces — one consumer holds unacked messages of a hash
 * at any time — replaces the Classic dispatcher's global
 * recentlyJoinedConsumers fence (R12), blocking per-hash instead of
 * per-consumer.
 *
 * Batch model — ONE drain cycle, the unit the tracker manages (longer
 * histories are repeated cycles): `joiner` joins at offset F1 (ranges
 * split, draining entries register) and leaves at F2 (its span returns
 * to a neighbor; its own unacked deliveries replay). Messages are
 * dispatched in offset order; a phase-A message (o < F1) delivered by
 * the pre-join table acks at o + (o mod 5 + 1)·ackDelayUnit — the
 * deterministic ack schedule that populates the tracker. Outcomes per
 * message: who received it first, who holds it finally, when it could
 * actually be sent (`deliver_seq`), whether a draining entry blocked it,
 * whether the leaver's departure replayed it — PIP-379 redelivers ALL
 * of a closing consumer's unacked messages, so the unacked-at-departure
 * proxy is uniform in the RECEIVE seq: anything the joiner received
 * (directly, or post-drain after being blocked) at or after
 * `retainFrom` replays at F2.
 *
 * Shape at 100 TB: the range tables and their changed-ownership spans
 * are control-plane relations (driver-folded, broadcast); draining
 * entries are ONE bucket-scale hash aggregate (≤ 65536 rows — the same
 * bound PIP-379's memory estimate leans on) broadcast back; every
 * corpus-side step is a broadcast equi/range join. The log never
 * shuffles.
 */
object DrainingHashes {

  /** Spans of the ring whose owner differs between two range tables:
   * (lo, hi, oldOwner, newOwner). Control-plane: both tables tile
   * [0, 65536), so this is a boundary walk. */
  def ownerChanges(before: Seq[Routing.HashRange],
      after: Seq[Routing.HashRange]): Seq[(Int, Int, String, String)] = {
    val bounds = (before.flatMap(r => Seq(r.lo, r.hi + 1)) ++
      after.flatMap(r => Seq(r.lo, r.hi + 1))).distinct.sorted
    bounds.sliding(2).collect { case Seq(lo, next) =>
      val hi = next - 1
      val o0 = before.find(r => r.lo <= lo && lo <= r.hi).map(_.consumer)
      val o1 = after.find(r => r.lo <= lo && lo <= r.hi).map(_.consumer)
      (lo, hi, o0, o1)
    }.collect {
      case (lo, hi, Some(a), Some(b)) if a != b => (lo, hi, a, b)
    }.toSeq
  }

  /**
   * The drain-cycle dispatch relation over an offset-ordered keyed log.
   * `membership` must contain (f1, "join", joiner) and (f2, "leave",
   * joiner) with f1 < f2; earlier events establish the pre-join table.
   * Output: (msg_offset, sticky_bucket, first_consumer, final_consumer,
   * deliver_seq, was_blocked, was_replayed).
   */
  def drainCycle(env: DataFrame, membership: Seq[(Long, String, String)],
      joiner: String, ackDelayUnit: Long, retainFrom: Long): DataFrame = {
    val spark = env.sparkSession
    import spark.implicits._
    val joinIdx = membership.indexWhere(e => e._2 == "join" && e._3 == joiner)
    val leaveIdx = membership.indexWhere(e => e._2 == "leave" && e._3 == joiner)
    require(joinIdx >= 0 && leaveIdx > joinIdx, "joiner must join then leave")
    val f1 = membership(joinIdx)._1
    val f2 = membership(leaveIdx)._1
    require(f1 < f2, "join offset must precede leave offset")
    val t0 = Routing.autoSplitFold(
      membership.take(joinIdx).map(e => (e._2, e._3)))
    val t1 = Routing.autoSplitFold(
      membership.take(joinIdx + 1).map(e => (e._2, e._3)))
    val t2 = Routing.autoSplitFold(
      membership.take(leaveIdx + 1).map(e => (e._2, e._3)))
    def tableDf(t: Seq[Routing.HashRange], owner: String) = broadcast(
      t.map(r => (r.consumer, r.lo, r.hi)).toDF(owner, s"${owner}_lo",
        s"${owner}_hi"))
    val impacted = ownerChanges(t0, t1)
    require(impacted.nonEmpty, "the join must move at least one span")
    val impactedDf = broadcast(impacted.map(c => (c._1, c._2, c._3))
      .toDF("imp_lo", "imp_hi", "imp_owner"))

    val slice = Routing.stickyBucket(env)
      .select(col("msg_offset"), col("sticky_bucket"))
      .withColumn("ack_seq",
        col("msg_offset") + (col("msg_offset") % 5 + 1) * ackDelayUnit)

    // draining registration at F1: phase-A messages still pending, on
    // spans that moved away from their owner → per-bucket entry with the
    // drain-complete seq (the last registered pending ack = the refCount
    // hitting zero). Bucket-scale aggregate, broadcast back.
    val entries = broadcast(slice
      .filter(col("msg_offset") < f1 && col("ack_seq") > f1)
      .join(impactedDf, col("sticky_bucket").between(col("imp_lo"),
        col("imp_hi")))
      .groupBy(col("sticky_bucket"))
      .agg(max(col("imp_owner")).as("entry_owner"),
        count(lit(1)).as("ref_count"),
        max(col("ack_seq")).as("drain_done"))
      .withColumnRenamed("sticky_bucket", "entry_bucket"))

    val withOwners = slice
      .join(tableDf(t0, "own0"), col("sticky_bucket").between(col("own0_lo"),
        col("own0_hi")))
      .join(tableDf(t1, "own1"), col("sticky_bucket").between(col("own1_lo"),
        col("own1_hi")))
      .join(tableDf(t2, "own2"), col("sticky_bucket").between(col("own2_lo"),
        col("own2_hi")))
      .join(entries, col("sticky_bucket") === col("entry_bucket"), "left")

    val o = col("msg_offset")
    val hasEntry = col("entry_bucket").isNotNull
    // rule 6: a hash whose entry owner is the attempted consumer is
    // lazily un-tracked — never blocked for that consumer. An entry is
    // GONE once its last registered ack lands (refCount zero removes it,
    // pip-379.md:233-244), so only attempts strictly before drain_done
    // block — at an ack/dispatch seq tie the ack clears first.
    val b1Blocked = hasEntry && col("own1") =!= col("entry_owner") &&
      o < col("drain_done")
    val b2Blocked = hasEntry && col("own2") =!= col("entry_owner") &&
      o < col("drain_done")
    // a B1-blocked hash unblocks at refCount-zero, or at F2 if the span
    // returns to the draining consumer (lazy removal on the re-attempt)
    val b1Unblock = when(col("own2") === col("entry_owner"),
      least(col("drain_done"), lit(f2))).otherwise(col("drain_done"))
    // the B1 receive event: a blocked message reaches its owner at
    // drain-complete (the joiner when that lands before the leave, the
    // post-leave owner otherwise); an unblocked one at its own offset
    val b1RecvSeq = when(b1Blocked, b1Unblock).otherwise(o)
    val b1Recv = when(b1Blocked,
      when(b1Unblock < f2, col("own1")).otherwise(col("own2")))
      .otherwise(col("own1"))
    // PIP-379 redelivers ALL of a closing consumer's unacked messages —
    // including ones it only received after a drain completed. The
    // unacked-at-departure proxy is uniform in the RECEIVE seq: anything
    // the joiner received at or after `retainFrom` is still unacked at
    // F2 and replays (this closes the r8 advisory: a blocked-then-
    // delivered message no longer keeps the departed consumer as its
    // final owner).
    val leaverReplay = b1Recv === lit(joiner) && b1RecvSeq >= retainFrom

    val out = withOwners.withColumn("phase",
      when(o < f1, "a").when(o < f2, "b1").otherwise("b2"))
    out.select(col("msg_offset"), col("sticky_bucket"),
      // first_consumer: who the dispatcher first SENDS to (a blocked
      // message's first send is its post-drain delivery)
      when(col("phase") === "a", col("own0"))
        .when(col("phase") === "b1", b1Recv)
        .otherwise(col("own2")).as("first_consumer"),
      when(col("phase") === "a", col("own0"))
        .when(col("phase") === "b1",
          when(leaverReplay, col("own2")).otherwise(b1Recv))
        .otherwise(col("own2")).as("final_consumer"),
      when(col("phase") === "a", o)
        .when(col("phase") === "b1",
          when(leaverReplay, lit(f2)).otherwise(b1RecvSeq))
        .otherwise(when(b2Blocked, col("drain_done")).otherwise(o))
        .as("deliver_seq"),
      (col("phase") === "b1" && b1Blocked ||
        col("phase") === "b2" && b2Blocked).as("was_blocked"),
      (col("phase") === "b1" && leaverReplay).as("was_replayed"))
  }
}
