package graft

import graft.operators.BatchSourceCycles
import graft.operators.BatchSourceCycles.Cycle
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The BatchSource trigger fold (U11) against hand-computed fixtures:
 * the discoverInProgress drop rule, backlog widening, tail draining past
 * the log horizon, and the distributed round-robin spread + digest. */
class BatchSourceCyclesSpec extends AnyFunSuite {
  import TestSpark._

  test("fold: no drops when discovery finishes within the period") {
    // period 100, 10 ms/task, fires at 100, 200, 300, 400…
    val got = BatchSourceCycles.fold(
      Map(1L -> 2L, 2L -> 3L, 4L -> 1L), periodMs = 100, perTaskMs = 10,
      t0 = 0)
    assert(got === Seq(
      Cycle(1, 0, 1, 100, 0), // busy to 120 < next fire
      Cycle(2, 1, 2, 200, 0), // busy to 230; fire 300 free but slot 3 empty
      Cycle(3, 2, 4, 400, 0)))
  }

  test("fold: busy discovery drops fires and widens the next window") {
    // 60 ms/task: cycle 1 (2 tasks) busy to 220 → fire 200 dropped;
    // cycle 2 ingests slots 2..3 (3 tasks), busy to 480 → fire 400
    // dropped; cycle 3 drains the tail
    val got = BatchSourceCycles.fold(
      Map(1L -> 2L, 2L -> 3L, 4L -> 1L), periodMs = 100, perTaskMs = 60,
      t0 = 0)
    assert(got === Seq(
      Cycle(1, 0, 1, 100, 0),
      Cycle(2, 1, 3, 300, 1),
      Cycle(3, 3, 5, 500, 1)))
  }

  test("fold: fires continue past the horizon until the backlog drains") {
    // one huge first cycle: busy covers every later in-log fire, so the
    // tail ingests at the first post-busy fire (k=7, past kMax=2)
    val got = BatchSourceCycles.fold(
      Map(1L -> 10L, 2L -> 1L), periodMs = 100, perTaskMs = 60, t0 = 0)
    assert(got === Seq(
      Cycle(1, 0, 1, 100, 0), // busy to 700
      Cycle(2, 1, 7, 700, 5)))
  }

  test("the schedule-scale bound is checked, not silent") {
    import TestSpark.spark
    import spark.implicits._
    // span guard: a 1 ms cron over a ~31-year span is ~1e12 slots — the
    // failure fires BEFORE the slot-count collect, naming the span
    val wide = Seq((1L, 0L), (2L, 1000000000000L)).toDF("event_id", "ms")
    val e1 = intercept[IllegalArgumentException] {
      BatchSourceCycles.cycles(wide, "event_id", "ms", periodMs = 1,
        perTaskMs = 0, instances = 1)
    }
    assert(e1.getMessage.contains("cron periods"))
    // drain guard: a busy time far past the horizon would iterate the
    // fold forever-ish — it fails at MaxSlots instead
    val e2 = intercept[IllegalArgumentException] {
      BatchSourceCycles.fold(Map(1L -> 1L, 2L -> 1L), periodMs = 1,
        perTaskMs = BatchSourceCycles.MaxSlots * 2, t0 = 0)
    }
    assert(e2.getMessage.contains("without draining"))
  }

  test("cycles: empty source log yields the empty relation, not a crash") {
    import TestSpark.spark
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("event_id", "ms")
    val got = BatchSourceCycles.cycles(empty, "event_id", "ms",
      periodMs = 100, perTaskMs = 0, instances = 2)
    assert(got.collect().isEmpty)
    assert(got.columns.toSeq === Seq("cycle", "fire_ms", "n_dropped",
      "n_tasks", "n_i0", "n_i1", "tasks_md5"))
  }

  test("cycles: round-robin spread and membership digest, end to end") {
    import TestSpark.spark
    import spark.implicits._
    val recs = Seq((1L, 50L), (2L, 60L), (3L, 150L), (4L, 160L),
      (5L, 350L)).toDF("event_id", "ms")
    // t0=50: slot 1 = ms (49, 150] → ids 1,2,3; slot 2 → id 4; slot 3 → 5
    val got = BatchSourceCycles.cycles(recs, "event_id", "ms",
      periodMs = 100, perTaskMs = 0, instances = 2)
      .orderBy(col("cycle")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getString(6)))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got.toSeq === Seq(
      (1, 150L, 0L, 3L, 2L, 1L, md5hex("1,2,3")),
      (2, 250L, 0L, 1L, 1L, 0L, md5hex("4")),
      (3, 350L, 0L, 1L, 1L, 0L, md5hex("5"))))
  }
}
