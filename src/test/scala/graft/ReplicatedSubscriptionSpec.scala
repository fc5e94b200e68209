package graft

import graft.operators.ReplicatedSubscription
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** S17 cursor-sync fold against hand-derived ground truth (the reference
 * algorithm applied by hand — putIfAbsent storage, two-round completion,
 * timeout drop, running-max UPDATE emission, forward-only sync). */
class ReplicatedSubscriptionSpec extends AnyFunSuite {
  import TestSpark._

  private def run(markers: Seq[(Long, Long, String, String, String, Long, Long)],
      advances: Seq[(Long, Long)], remotes: Seq[String], timeoutMs: Long) = {
    import TestSpark.spark
    import spark.implicits._
    ReplicatedSubscription.sync(
      markers.toDF("seq", "ts_ms", "mtype", "sid", "cluster",
        "r_ledger", "r_entry"),
      advances.toDF("adv_seq", "md_entry"), remotes, timeoutMs)
      .orderBy(col("snapshot_id"), col("cluster")).collect()
      .map(r => (r.getString(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getString(4),
        if (r.isNullAt(5)) -1L else r.getLong(5)))
  }

  test("two-round completion stores FIRST responses; update fold skips " +
      "overtaken snapshots; timeout and missing-response branches") {
    val markers = Seq(
      // s1: clean two-round completion at seq 6
      (1L, 0L, "REQUEST", "s1", "A", 0L, 0L),
      (2L, 100L, "RESPONSE", "s1", "B", 10L, 5L),
      (3L, 200L, "RESPONSE", "s1", "C", 20L, 7L),
      (4L, 300L, "REQUEST", "s1", "A", 0L, 0L),
      (5L, 400L, "RESPONSE", "s1", "B", 10L, 6L), // must NOT overwrite
      (6L, 500L, "RESPONSE", "s1", "C", 20L, 9L),
      // s2: C never answers round 2 → incomplete
      (7L, 1000L, "REQUEST", "s2", "A", 0L, 0L),
      (8L, 1100L, "RESPONSE", "s2", "B", 10L, 8L),
      (9L, 1200L, "RESPONSE", "s2", "C", 20L, 11L),
      (10L, 1300L, "REQUEST", "s2", "A", 0L, 0L),
      (11L, 1400L, "RESPONSE", "s2", "B", 10L, 9L),
      // s3: completes at t=13000, 11 s after the request → timed out
      (12L, 2000L, "REQUEST", "s3", "A", 0L, 0L),
      (13L, 2500L, "RESPONSE", "s3", "B", 10L, 12L),
      (14L, 3000L, "RESPONSE", "s3", "C", 20L, 14L),
      (15L, 3500L, "REQUEST", "s3", "A", 0L, 0L),
      (16L, 4000L, "RESPONSE", "s3", "B", 10L, 13L),
      (17L, 13000L, "RESPONSE", "s3", "C", 20L, 16L),
      // s4: round-2 out of order (C then B), completes at seq 23
      (18L, 20000L, "REQUEST", "s4", "A", 0L, 0L),
      (19L, 20100L, "RESPONSE", "s4", "B", 10L, 20L),
      (20L, 20200L, "RESPONSE", "s4", "C", 20L, 22L),
      (21L, 20300L, "REQUEST", "s4", "A", 0L, 0L),
      (22L, 20400L, "RESPONSE", "s4", "C", 20L, 23L),
      (23L, 20500L, "RESPONSE", "s4", "B", 10L, 21L),
      // s5: completed (seq 29) but the cursor never reaches it
      (24L, 30000L, "REQUEST", "s5", "A", 0L, 0L),
      (25L, 30100L, "RESPONSE", "s5", "B", 10L, 30L),
      (26L, 30200L, "RESPONSE", "s5", "C", 20L, 32L),
      (27L, 30300L, "REQUEST", "s5", "A", 0L, 0L),
      (28L, 30400L, "RESPONSE", "s5", "B", 10L, 31L),
      (29L, 30500L, "RESPONSE", "s5", "C", 20L, 33L))
    val advances = Seq((1L, 3L), (2L, 10L), (3L, 24L), (4L, 25L))
    val got = run(markers, advances, Seq("B", "C"), timeoutMs = 10000L)
    // hand-derived: md=3 → nothing; md=10 → s1 (entry 6, upd 1); md=24 →
    // s4 (entry 23, upd 2; s2/s3 can never apply); md=25 → no new best
    assert(got.toSeq === Seq(
      ("s1", "completed", 6L, 1L, "B", 10000005L),
      ("s1", "completed", 6L, 1L, "C", 20000007L),
      ("s2", "incomplete", -1L, -1L, "B", -1L),
      ("s2", "incomplete", -1L, -1L, "C", -1L),
      ("s3", "timed_out", -1L, -1L, "B", -1L),
      ("s3", "timed_out", -1L, -1L, "C", -1L),
      ("s4", "completed", 23L, 2L, "B", 10000020L),
      ("s4", "completed", 23L, 2L, "C", 20000022L),
      ("s5", "completed", 29L, -1L, "B", 10000030L),
      ("s5", "completed", 29L, -1L, "C", 20000032L)))
  }

  test("single remote needs ONE round; its first response completes") {
    val markers = Seq(
      (1L, 0L, "REQUEST", "s1", "A", 0L, 0L),
      (2L, 100L, "RESPONSE", "s1", "B", 10L, 5L))
    val got = run(markers, Seq((1L, 2L)), Seq("B"), timeoutMs = 10000L)
    assert(got.toSeq === Seq(("s1", "completed", 2L, 1L, "B", 10000005L)))
  }
}
