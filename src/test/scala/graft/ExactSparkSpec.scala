package graft

import graft.functions.Exact
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Spark-evaluation battery for the Exact renderings: ExactIntProps
 * proves the ALGEBRA over Scala longs; this spec closes the remaining
 * assumption — that Spark's `div`/`%`/`floor` evaluate the rendered
 * expressions to the same longs (they share Java long semantics on
 * non-negative inputs, but the rendering itself could drift: literal
 * widths, precedence, implicit casts). Boundary cases include the
 * property-discovered den bound and corpus-scale sums past the naive
 * form's ~4.6e14 overflow line.
 */
class ExactSparkSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def scalaRatioE(num: Long, den: Long, k: Int): Long = {
    val m = math.pow(10, k).toLong
    (num / den) * m + (2 * (num % den) * m + den) / (2 * den)
  }

  test("sparkRatioE evaluates to the Scala/BigInt reference at the boundaries") {
    val k = 4
    val m = 10000L
    val denMax = Long.MaxValue / (2 * m + 1)
    val cases = Seq[(Long, Long)](
      (0L, 1L), (1L, 1L), (1L, 3L), (2L, 3L), (5L, 2L), // tie: 2.5 rounds up
      (500_000_000_000_000L, 7L),        // past the naive 2·num·10^k line
      // (~4.6117e14 at k=4) with a SMALL den and nonzero remainder —
      // the regime the split form exists for
      (Long.MaxValue / m, 1L),           // largest exact quotient at k=4
      (denMax, denMax),                  // num = den at the den bound
      (denMax - 1, denMax),              // r = den−1 at the den bound
      (Long.MaxValue, denMax))           // full-range num over max den
    // NOT a case: den past the bound (e.g. den = Long.MaxValue) — 2·den
    // overflows, and ANSI Spark THROWS where bare Scala longs wrap
    // silently, so a precondition violation fails loudly in the engine
    val df = cases.toDF("num", "den")
      .withColumn("got", expr(Exact.sparkRatioE("num", "den", k)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    df.foreach { case (num, den, got) =>
      val want = scalaRatioE(num, den, k)
      val big = ((2 * BigInt(num) * m + den) / (2 * BigInt(den))).toLong
      assert(got == want && got == big, s"ratioE($num, $den): $got vs $want/$big")
    }
  }

  test("eRow/rRow/sumE evaluate to the math.floor reference") {
    val xs = Seq(0.0, 0.005, 0.004999, -0.005, 1.23456789, -7.5e-5,
      92233720368.54, -92233720368.54, 3.14159e6)
    val df = xs.toDF("x")
      .withColumn("e2", Exact.eRow(col("x"), 2))
      .withColumn("r4", Exact.rRow(col("x"), 4))
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getDouble(2)))
    df.foreach { case (x, e2, r4) =>
      assert(e2 == math.floor(x * 100 + 0.5).toLong, s"eRow($x)")
      assert(r4 == math.floor(x * 10000 + 0.5) / 10000, s"rRow($x)")
    }
    val Seq(s2) = xs.toDF("x").agg(Exact.sumE(col("x"), 2)).as[Double].collect().toSeq
    val want = xs.map(x => math.floor(x * 100 + 0.5).toLong).sum.toDouble / 100
    assert(s2 == want)
  }

  test("eRow38 sums stay exact past the Long line (the q1 100 TB class)") {
    // 2,000 rows whose e4 codes are ~9.2e15 each (inside eRow's 2^53
    // per-ROW bound): Σcodes ≈ 1.845e19 — PAST 2^63−1 ≈ 9.22e18, the
    // regime a q1-shape money sum reaches at ~1e11 corpus-scale group
    // rows. The decimal(38,0) accumulator must equal the BigInt
    // reference exactly; the Long accumulator CANNOT represent it (the
    // reference exceeds Long.MaxValue), which is the cross-engine
    // divergence eRow38 retires (DuckDB promotes to HUGEINT silently).
    val x = 922_337_203_685.0 // e4 code = 9223372036850000 < 2^53
    val n = 2000
    val df = Seq.fill(n)(x).toDF("x")
    val want = BigInt(math.floor(x * 10000 + 0.5).toLong) * n
    assert(want > BigInt(Long.MaxValue),
      "fixture must actually cross the Long line")
    val got = df.agg(sum(Exact.eRow38(col("x"), 4)).as("s"))
      .head().getDecimal(0)
    assert(BigInt(got.toBigInteger) == want)
    // and the final IEEE division lands on the same double as the
    // BigInt reference's
    val gotD = df.agg((sum(Exact.eRow38(col("x"), 4)).cast("double") /
        lit(1e4)).as("d")).head().getDouble(0)
    assert(gotD == want.toDouble / 1e4)
    // in-range sanity: decimal and Long accumulators agree exactly
    // below the line (the gate-SF regime — q1's hashes are unchanged)
    val small = Seq(1.05, 2.10, 3.99, 0.01).toDF("x")
    val dec = small.agg(sum(Exact.eRow38(col("x"), 4)).cast("long"))
      .head().getLong(0)
    val lng = small.agg(sum(Exact.eRow(col("x"), 4))).head().getLong(0)
    assert(dec == lng)
  }

  test("sqlERow/sqlRRow render to the same values via Spark SQL") {
    val xs = Seq(0.005, -0.005, 12.34515, 1e9 + 0.12345)
    xs.toDF("x").createOrReplaceTempView("exact_spark_spec_v")
    val rows = spark.sql(
      s"SELECT x, ${Exact.sqlERow("x", 3)} AS e3, ${Exact.sqlRRow("x", 3)} AS r3 " +
        "FROM exact_spark_spec_v").collect()
    rows.foreach { r =>
      val x = r.getDouble(0)
      assert(r.getLong(1) == math.floor(x * 1000 + 0.5).toLong, s"sqlERow($x)")
      assert(r.getDouble(2) == math.floor(x * 1000 + 0.5) / 1000, s"sqlRRow($x)")
    }
    spark.catalog.dropTempView("exact_spark_spec_v")
  }
}
