package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * The round-16 repo-wide rounding invariant as a NAMED spec (the r16
 * verdict's ask): no oracle-compared column may ride `round()` — the
 * engine-portable convention is the per-row/per-term
 * `floor(x·10^k + 0.5)` integer code ([[graft.functions.Exact]]),
 * exact integer sums, one final IEEE division. `round(sum(FLOAT), k)`
 * is order-dependent across partial aggregation (the p54/p79 failure
 * class) and `round()`'s tie rule is engine-defined even per-row, so
 * the invariant is total: zero `round(` in any DuckDB oracle string,
 * zero `Round`/`BRound` over a non-literal child in any engine query's
 * analyzed plan. Until this spec, the invariant was enforced only by a
 * grep in the round-16 closing gate — a new QueryDef shipping
 * `round(sum(x), 2)` would have sailed to the driver gate and failed
 * there as an anonymous hash mismatch (or worse, passed at gate SF and
 * diverged on a 1000-partition cluster). Now it fails HERE, by name.
 *
 * The detector is itself detector-tested: the last test feeds it the
 * exact mutation class the sweep retired (engine and SQL side) and
 * asserts both are flagged — so a regression in the walker can't
 * silently blind the invariant.
 */
class OracleHygieneSpec extends AnyFunSuite {
  import TestSpark._
  import SurfaceWalk.roundOffenders

  /** `round(` as a word in SQL text, case-insensitively — DuckDB resolves
   * function names case-insensitively, and column aliases can't collide
   * (`_round(` / `xround(` don't match the word boundary). */
  private def sqlHasRound(sql: String): Boolean =
    "(?i)\\bround\\s*\\(".r.findFirstIn(sql).isDefined

  test("no oracle SQL string contains round(") {
    val bad = SparkEntry.oracleSql.collect {
      case (name, sql) if sqlHasRound(sql) => name
    }.toSeq.sorted
    assert(bad.isEmpty,
      s"oracle SQL for ${bad.mkString(", ")} uses round() — " +
        "use the floor(x*1eK + 0.5) integer form (Exact convention)")
  }

  test("no engine query's analyzed plan rounds a non-literal expression") {
    // the ONE shared surface walk (SurfaceWalk — plan builds run eager
    // fixture-staging side effects, so the suites share a single pass);
    // a builder that THROWS is reported here by query name too
    val bad = SurfaceWalk.facts.toSeq.sortBy(_._1).flatMap {
      case (name, f) =>
        f.failure.map(e => s"$name: plan build failed: $e").toSeq ++
          f.roundOffenders.map(e => s"$name: $e")
    }
    assert(bad.isEmpty,
      s"engine queries round non-literal expressions:\n  " +
        bad.mkString("\n  "))
  }

  test("the detector flags the retired mutation class (both sides)") {
    // the exact regression the invariant exists to stop: a new query
    // shipping round(sum(x), 2) with a round()-based oracle
    val mutant: DataFrame = spark.range(10).toDF("x")
      .agg(round(sum(col("x") * 0.1), 2).as("s"))
    assert(roundOffenders(mutant.queryExecution.analyzed).nonEmpty,
      "plan walker missed Round over an aggregate")
    val bmutant = spark.range(10).toDF("x")
      .select(bround(col("x") * 0.1, 1).as("b"))
    assert(roundOffenders(bmutant.queryExecution.analyzed).nonEmpty,
      "plan walker missed BRound over a per-row expression")
    // constant rounding stays legal (driver-side literal constants are
    // the one place math.round/round survives in src/main)
    val constant = spark.range(10).toDF("x")
      .select(round(lit(2.345), 2).as("c"))
    assert(roundOffenders(constant.queryExecution.analyzed).isEmpty,
      "plan walker flagged a foldable constant round")
    assert(sqlHasRound("SELECT ROUND(sum(x), 2) FROM t"))
    assert(sqlHasRound("SELECT round (x, 4) FROM t"))
    assert(!sqlHasRound(
      "SELECT CAST(floor(x * 1e4 + 0.5) AS BIGINT) / 1e4 FROM t_round"))
  }
}
