package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Event-analytics queries (q29 funnel, q30 retention) against hand
 * fixtures written as a real events.parquet dir — the greedy stage
 * chaining (an out-of-order purchase must NOT complete the funnel) and
 * the cohort/offset integer arithmetic are pinned row by row. */
class FunnelSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  /** Write a minimal events.parquet (ms timestamps) and return the dir. */
  private def eventsDir(rows: Seq[(Long, Long, Long, String)]): String = {
    val dir = Scratch.freshDir("funnel-events")
    rows.map { case (id, ms, user, typ) =>
      (id, new java.sql.Timestamp(ms), user, typ, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("funnel: greedy chaining; an early purchase cannot complete it") {
    val dir = eventsDir(Seq(
      // user 1: full ordered funnel
      (1L, 1000L, 1L, "signup"), (2L, 2000L, 1L, "view"),
      (3L, 3000L, 1L, "click"), (4L, 4000L, 1L, "purchase"),
      // user 2: purchase BEFORE the chain + no click → stalls at view
      (5L, 500L, 2L, "purchase"), (6L, 1000L, 2L, "signup"),
      (7L, 2000L, 2L, "view"),
      // user 3: never signs up → stage 0
      (8L, 100L, 3L, "view")))
    val got = SparkEntry.queries("q29_funnel")(spark, dir)
      .collect().map(r => r.getAs[Long]("stage") ->
        (r.getAs[String]("stage_name"), r.getAs[Long]("n_users"),
          r.getAs[Long]("conv_ppm"), r.getAs[Long]("step_ppm"))).toMap
    assert(got(1L) === (("signup", 2L, 666666L, 666666L)))
    assert(got(2L) === (("view", 2L, 666666L, 1000000L)))
    assert(got(3L) === (("click", 1L, 333333L, 500000L)))
    assert(got(4L) === (("purchase", 1L, 333333L, 1000000L)))
  }

  test("retention cohorts: hand-computed weeks, offsets, and ppm") {
    val day = 86400000L
    val dir = eventsDir(Seq(
      // user 1: cohort week 0 (day 0), active weeks 0 and 1 (day 8)
      (1L, 0L, 1L, "view"), (2L, 8L * day, 1L, "click"),
      // user 2: cohort week 1 (day 7), active week-offset 0 only
      (3L, 7L * day, 2L, "view")))
    val got = SparkEntry.queries("q30_retention_cohorts")(spark, dir)
      .collect().map(r => (r.getAs[Long]("cohort_week"),
        r.getAs[Long]("offset_week")) ->
        (r.getAs[Long]("n_active"), r.getAs[Long]("cohort_size"),
          r.getAs[Long]("retention_ppm"))).toMap
    assert(got.keySet === Set((0L, 0L), (0L, 1L), (1L, 0L)))
    assert(got((0L, 0L)) === ((1L, 1L, 1000000L)))
    assert(got((0L, 1L)) === ((1L, 1L, 1000000L)))
    assert(got((1L, 0L)) === ((1L, 1L, 1000000L)))
  }

  test("rfm segments: quintile scores reproduce a hand-ranked ladder") {
    val day = 86400000L
    // user u (1..5): u events of value u, last active day u →
    // frequency quintile score = u, monetary = u, recency = 6 − u
    val rows = (1L to 5L).flatMap { u =>
      (0L until u).map(i => (u * 10 + i, u * day - 1, u, s"e$i"))
    }
    val dir = Scratch.freshDir("rfm-events")
    import spark.implicits._
    rows.map { case (id, ms, user, typ) =>
      (id, new java.sql.Timestamp(ms), user, typ, user.toDouble, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q32_rfm_segments")(spark, dir)
      .collect().map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("r_score"), r.getAs[Long]("f_score"),
          r.getAs[Long]("m_score"), r.getAs[Long]("rfm"))).toMap
    (1L to 5L).foreach { u =>
      assert(got(u) === ((6 - u, u, u, (6 - u) * 100 + u * 10 + u)),
        s"user $u: ${got(u)}")
    }
  }

  test("q29 plan: the four chained stage minimums share one exchange") {
    val df = SparkEntry.queries("q29_funnel")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    // all four stage windows partition on user_id with no ordering — one
    // user-key hash exchange, no per-stage re-shuffle, nothing serializes
    // before the deliberate 1-row report aggregate
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(plan).size === 1, plan)
    CacheScope.releaseAll()
  }
}
