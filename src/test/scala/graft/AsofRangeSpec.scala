package graft

import graft.operators.{AsofJoin, RangeJoin}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** As-of and range joins vs naive driver-side reference implementations
 * on adversarial fixtures (tied instants, null payload values, empty
 * keys, bin-boundary points). The oracle queries (j4/j4b/j5) check the
 * same operators against DuckDB's ASOF JOIN / IEJoin at data scale;
 * these specs pin the edge semantics. */
class AsofRangeSpec extends AnyFunSuite {
  import TestSpark._

  // deterministic pseudo-random fixture: key ∈ {k0..k3}, ts ∈ [0, 200)
  private def mix(i: Long, salt: Long): Long = {
    var x = i * 0x9E3779B97F4A7C15L + salt
    x ^= x >>> 33; x *= 0xFF51AFD7ED558CCDL; x ^= x >>> 29
    math.abs(x)
  }

  private lazy val leftRows: Seq[(String, Long, Long)] =
    (0L until 300L).map(i => (s"k${mix(i, 1) % 4}", mix(i, 2) % 200, i))
  // right unique per (key, ts) — the operator's documented contract
  private lazy val rightRows: Seq[(String, Long, Long)] =
    (0L until 300L).map(i => (s"k${mix(i, 3) % 4}", mix(i, 4) % 200, i * 10))
      .groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toSeq

  private def naive(forward: Boolean, tol: Option[Long]): Map[(String, Long, Long), Option[(Long, Long)]] =
    leftRows.map { case (k, ts, id) =>
      val cands =
        if (forward) rightRows.filter(r => r._1 == k && r._2 >= ts)
        else rightRows.filter(r => r._1 == k && r._2 <= ts)
      val best =
        if (cands.isEmpty) None
        else {
          val m = if (forward) cands.minBy(_._2) else cands.maxBy(_._2)
          val gap = if (forward) m._2 - ts else ts - m._2
          if (tol.exists(gap > _)) None else Some((m._2, m._3))
        }
      (k, ts, id) -> best
    }.toMap

  private def run(forward: Boolean, tol: Option[Long]): Map[(String, Long, Long), Option[(Long, Long)]] = {
    import spark.implicits._
    val l = leftRows.toDF("k", "ts", "lid")
    val r = rightRows.toDF("k", "ts", "payload").withColumnRenamed("ts", "rts")
    AsofJoin.asofJoin(l, r, Seq("k"), "ts", "rts", forward = forward, tolerance = tol)
      .collect()
      .map { row =>
        val m =
          if (row.isNullAt(row.fieldIndex("asof_ts"))) None
          else Some((row.getAs[Long]("asof_ts"), row.getAs[Long]("payload")))
        (row.getAs[String]("k"), row.getAs[Long]("ts"), row.getAs[Long]("lid")) -> m
      }.toMap
  }

  test("backward as-of equals naive scan (incl. tied instants)") {
    assert(run(forward = false, None) === naive(forward = false, None))
  }

  test("forward as-of equals naive scan") {
    assert(run(forward = true, None) === naive(forward = true, None))
  }

  test("tolerance drops distant matches, keeps boundary-exact ones") {
    assert(run(forward = false, Some(13L)) === naive(forward = false, Some(13L)))
    assert(run(forward = true, Some(13L)) === naive(forward = true, Some(13L)))
  }

  test("genuinely-null payload values survive (no skip to older rows)") {
    import spark.implicits._
    // right row at ts=10 carries a NULL payload; left at ts=11 must match
    // it (asof_ts=10, payload NULL), NOT fall back to the ts=5 row.
    val l = Seq(("a", 11L)).toDF("k", "ts")
    val r = Seq(("a", 5L, Some(50L)), ("a", 10L, None))
      .toDF("k", "rts", "payload")
    val out = AsofJoin.asofJoin(l, r, Seq("k"), "ts", "rts").collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("asof_ts") === 10L)
    assert(out.head.isNullAt(out.head.fieldIndex("payload")))
  }

  test("unmatched left rows keep all-null match columns") {
    import spark.implicits._
    val l = Seq(("a", 1L), ("b", 5L)).toDF("k", "ts")
    val r = Seq(("a", 3L, 30L)).toDF("k", "rts", "payload")
    val back = AsofJoin.asofJoin(l, r, Seq("k"), "ts", "rts").collect()
    assert(back.forall(row => row.isNullAt(row.fieldIndex("asof_ts"))))
    val fwd = AsofJoin.asofJoin(l, r, Seq("k"), "ts", "rts", forward = true)
      .collect().map(row => (row.getAs[String]("k"),
        Option(row.getAs[java.lang.Long]("asof_ts")))).toMap
    assert(fwd === Map("a" -> Some(3L), "b" -> None))
  }

  private def naiveNearest(tol: Option[Long]): Map[(String, Long, Long), Option[(Long, Long)]] =
    leftRows.map { case (k, ts, id) =>
      val cands = rightRows.filter(_._1 == k)
        .map(r => (math.abs(r._2 - ts), r._2, r._3))
        .filter(c => tol.forall(c._1 <= _))
      // min gap, tie to the EARLIER right ts (= backward preference)
      val best = if (cands.isEmpty) None
        else { val m = cands.minBy(c => (c._1, c._2)); Some((m._2, m._3)) }
      (k, ts, id) -> best
    }.toMap

  test("nearest as-of equals naive min-|gap| scan (tie → backward)") {
    import spark.implicits._
    val l = leftRows.toDF("k", "ts", "lid")
    val r = rightRows.toDF("k", "ts", "payload").withColumnRenamed("ts", "rts")
    for (tol <- Seq(None, Some(13L))) {
      val got = AsofJoin.asofNearest(l, r, Seq("k"), "ts", "rts", tolerance = tol)
        .collect().map { row =>
          val m = if (row.isNullAt(row.fieldIndex("asof_ts"))) None
            else Some((row.getAs[Long]("asof_ts"), row.getAs[Long]("payload")))
          (row.getAs[String]("k"), row.getAs[Long]("ts"),
            row.getAs[Long]("lid")) -> m
        }.toMap
      assert(got === naiveNearest(tol), s"tol=$tol")
    }
  }

  test("nearest: out-of-bound backward never shadows an in-bound forward") {
    import spark.implicits._
    // backward candidate at gap 8 (out of tol 5), forward at gap 3 (in):
    // the valid forward match must win, not be discarded with the row
    val l = Seq(("a", 10L)).toDF("k", "ts")
    val r = Seq(("a", 2L, 20L), ("a", 13L, 130L)).toDF("k", "rts", "payload")
    val out = AsofJoin.asofNearest(l, r, Seq("k"), "ts", "rts",
      tolerance = Some(5L)).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("asof_ts") === 13L)
    assert(out.head.getAs[Long]("payload") === 130L)
  }

  test("nearest plan: both direction frames share one key exchange") {
    import spark.implicits._
    val l = leftRows.toDF("k", "ts", "lid")
    val r = rightRows.toDF("k", "ts", "payload").withColumnRenamed("ts", "rts")
    val plan = AsofJoin.asofNearest(l, r, Seq("k"), "ts", "rts")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
    assert("Exchange hashpartitioning\\(k".r.findAllIn(plan).size === 1, plan)
  }

  test("interval overlap equals brute force; touching intervals excluded") {
    import spark.implicits._
    // pseudo-random half-open intervals on both sides, incl. multi-bin
    // spans and exact-touch cases (a.e == b.s must NOT pair)
    val ls = (0L until 120L).map { i =>
      val s = mix(i, 11) % 180; (i, s, s + 1 + mix(i, 12) % 25)
    }
    val rs = (0L until 120L).map { i =>
      val s = mix(i, 13) % 180; (i, s, s + 1 + mix(i, 14) % 25)
    }
    val l = ls.toDF("l_id", "l_s", "l_e")
    val r = rs.toDF("r_id", "r_s", "r_e")
    val got = RangeJoin.intervalOverlap(l, r, "l_s", "l_e", "r_s", "r_e",
        binWidth = 10L)
      .select("l_id", "r_id").collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    val want = (for {
      (li, lsv, lev) <- ls; (ri, rsv, rev) <- rs
      if lsv < rev && rsv < lev
    } yield (li, ri)).toSet
    assert(got.length === got.toSet.size, "a pair was emitted twice")
    assert(got.toSet === want)
    // explicit touch case: [0,10) and [10,20) share no point
    val t = RangeJoin.intervalOverlap(
      Seq((1L, 0L, 10L)).toDF("l_id", "l_s", "l_e"),
      Seq((2L, 10L, 20L)).toDF("r_id", "r_s", "r_e"), "l_s", "l_e",
      "r_s", "r_e", 10L).collect()
    assert(t.isEmpty)
  }

  test("range join equals direct inequality join across bin boundaries") {
    import spark.implicits._
    // points at every integer incl. exact bin edges; intervals of mixed
    // lengths (sub-bin, exact-bin, multi-bin, empty)
    val pts = (0L until 100L).map(p => (p, s"p$p")).toDF("x", "pname")
    val ivs = Seq(
      (1L, 0L, 3L), (2L, 10L, 10L), (3L, 9L, 20L), (4L, 15L, 47L),
      (5L, 40L, 41L), (6L, 99L, 200L), (7L, 20L, 30L))
      .toDF("iv_id", "s", "e")
    val got = RangeJoin.pointInInterval(pts, ivs, "x", "s", "e", binWidth = 10L)
      .select("iv_id", "x").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      (iv, s, e) <- Seq((1L, 0L, 3L), (2L, 10L, 10L), (3L, 9L, 20L),
        (4L, 15L, 47L), (5L, 40L, 41L), (6L, 99L, 200L), (7L, 20L, 30L))
      p <- 0L until 100L if p >= s && p < e
    } yield (iv, p)).toSet
    assert(got === want)
  }

  test("range join with equi-keys only matches within the key") {
    import spark.implicits._
    val pts = Seq(("u1", 5L), ("u2", 5L)).toDF("k", "x")
    val ivs = Seq(("u1", 1L, 0L, 10L)).toDF("k", "iv_id", "s", "e")
    val got = RangeJoin.pointInInterval(pts, ivs, "x", "s", "e", 10L, keys = Seq("k"))
      .select("k", "x").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === Set(("u1", 5L)))
  }

  test("as-of plan is one shuffle on the key (no broadcast, no BNLJ)") {
    import spark.implicits._
    val l = leftRows.toDF("k", "ts", "lid")
    val r = rightRows.toDF("k", "ts", "payload").withColumnRenamed("ts", "rts")
    val plan = AsofJoin.asofJoin(l, r, Seq("k"), "ts", "rts")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
    // exactly one exchange: the window's hashpartitioning on the key
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1, plan)
  }
}
