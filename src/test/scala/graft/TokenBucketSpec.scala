package graft

import graft.operators.TokenBucket
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The AsyncTokenBucket fold (o6b): hand fixtures pinning the
 * reference's semantics (clamp-before-consume, negative balances,
 * floored accrual, the refill-duration formula), naive-fold parity over
 * a pseudo-random request log, and the relative-rate mode's invariants. */
class TokenBucketSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def run(rows: Seq[(String, Long, Long, Long)],
      p: TokenBucket.Params): Map[(String, Long), (Long, Boolean, Long)] =
    TokenBucket.balances(rows.toDF("k", "tms", "ord", "c"),
        col("k"), col("tms"), col("ord"), col("c"), p)
      .collect()
      .map(r => (r.getString(0), r.getLong(2)) ->
        ((r.getLong(4), r.getBoolean(5), r.getLong(6))))
      .toMap

  test("clamp-before-consume, negative balance, floored accrual") {
    // rate 2 per 10 ms, cap 10, init 4, target = max(1, 10/100) = 1
    val p = TokenBucket.Params(rate = 2, periodMs = 10, capacity = 10,
      initialTokens = 4)
    val got = run(Seq(
      ("t", 0L, 1L, 3L),   // t0: accrual 0 → min(4,10)−3 = 1
      ("t", 14L, 2L, 0L),  // floor(14·2/10)=2 new → min(1+2,10)−0 = 3
      ("t", 100L, 3L, 25L),// accrual 20, Δ=18 → min(3+18,10)−25 = −15
      ("t", 105L, 4L, 0L), // accrual 21, Δ=1 → min(−15+1,10) = −14
      ("t", 400L, 5L, 0L)  // accrual 80, Δ=59 → min(−14+59,10) = 10
    ), p)
    assert(got(("t", 1L)) === ((1L, false, 0L)))
    assert(got(("t", 2L)) === ((3L, false, 0L)))
    // throttle duration: (1 − (−15))·10 div 2 = 80 ms; (1+14)·10 div 2 = 75
    assert(got(("t", 3L)) === ((-15L, true, 80L)))
    assert(got(("t", 4L)) === ((-14L, true, 75L)))
    assert(got(("t", 5L)) === ((10L, false, 0L)))
  }

  test("refill target: default cap/100, floor division, explicit override") {
    // cap 300 → default required = 3: a balance of 2 is positive (NOT
    // throttled — containsTokens is > 0) yet still pays a refill pause
    val p = TokenBucket.Params(rate = 7, periodMs = 1000, capacity = 300,
      initialTokens = 2)
    val got = run(Seq(("t", 0L, 1L, 0L)), p)
    // (3 − 2)·1000 div 7 = 142 (floored)
    assert(got(("t", 1L)) === ((2L, false, 142L)))
    val p2 = p.copy(targetAfterThrottle = 9L)
    val got2 = run(Seq(("t", 0L, 1L, 0L)), p2)
    // (9 − 2)·1000 div 7 = 1000
    assert(got2(("t", 1L)) === ((2L, false, 1000L)))
  }

  test("naive-fold parity over a pseudo-random multi-key log") {
    val p = TokenBucket.Params(rate = 13, periodMs = 97, capacity = 50,
      initialTokens = 20)
    val lcg = new Lcg(0xb0c4e7L)
    val rows = (1 to 400).map { i =>
      (s"k${lcg.next(3)}", lcg.next(5000L), i.toLong, lcg.next(9L))
    }
    // driver-side replay of the reference fold: clamp at cap, then
    // subtract; accrual floor((t − t0)·r/p) cumulative
    val expected = rows.groupBy(_._1).flatMap { case (k, rs) =>
      val sorted = rs.sortBy(r => (r._2, r._3))
      val t0 = sorted.head._2
      var tokens = BigInt(p.initialTokens)
      var prevAdd = BigInt(0)
      sorted.map { case (_, t, ord, c) =>
        val addCum = (BigInt(t - t0) * p.rate) / p.periodMs
        tokens = (tokens + (addCum - prevAdd)).min(BigInt(p.capacity)) - c
        prevAdd = addCum
        (k, ord) -> tokens.toLong
      }
    }
    val got = run(rows, p)
    expected.foreach { case (key, want) =>
      assert(got(key)._1 === want, s"at $key")
    }
  }

  test("relative mode: a perfectly steady consumer never throttles; " +
    "a single-request key does not divide by zero") {
    // 60 requests, 1 token each, exactly 10 ms apart: rate = 60 per
    // 590 ms span — accrual matches consumption, balance hovers at init
    val steady = (0 until 60).map(i => ("s", i * 10L, i.toLong, 1L))
    val single = Seq(("one", 42L, 1L, 5L))
    val out = TokenBucket.balancesRelative(
      (steady ++ single).toDF("k", "tms", "ord", "c"),
      col("k"), col("tms"), col("ord"), col("c"),
      burstFraction = 4L, minCapacity = 16L).collect()
    val s = out.filter(_.getString(0) == "s")
    assert(s.length === 60 && s.forall(!_.getBoolean(5)))
    // single key: span 0 → period clamps to 1; cap floors at 16, init 8
    val one = out.filter(_.getString(0) == "one")
    assert(one.length === 1)
    assert(one.head.getLong(4) === 3L) // min(8, 16)… accrual 0 → 8 − 5
  }
}
