package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * The house convention for deterministic money/measure aggregation —
 * the round-16 repo-wide retirement of the `round(sum(FLOAT), k)` class.
 *
 * `round(sum(x), k)` over a float term is order-dependent across partial
 * aggregation: float addition is not associative, so Spark's
 * partial/final split and DuckDB's single-pass sum can land on opposite
 * sides of a k-dp rounding boundary (the round-6 p54/p79 failure class).
 * Every oracle-compared money/measure sum therefore quantizes each TERM
 * to an exact e-k integer per row — `floor(x·10^k + 0.5)`, lossless when
 * the data is exactly k-dp (the fixture's money columns are; measured in
 * STATUS.md) — sums the INTEGERS (exact and associative in any order),
 * and applies ONE final correctly-rounded IEEE division. Both engines run
 * the identical pipeline, so the result is a function of the multiset of
 * inputs, never of the aggregation tree shape.
 *
 * A note on the SQL side: most DuckDB oracle strings INLINE the literal
 * `CAST(floor((x) * 1eK + 0.5) AS BIGINT)` form rather than interpolate
 * the helpers — oracles are deliberately independent replications, and
 * a fully shared SQL generator would let a helper bug pass both engines
 * unnoticed. The SQL twins here are for sites where the expression is
 * already interpolated (scale constants) and textual drift is the
 * bigger risk.
 *
 * The ratio/avg helpers carry the same discipline to rounded integer
 * ratios, in the overflow-safe split form: round-half-up of num·10^k/den
 * decomposes as quotient·10^k + remainder-rounding, keeping every
 * intermediate ≤ den·(2·10^k+1) where the naive `(2·num·10^k + den) div
 * (2·den)` overflows Long once num exceeds ~4.6·10^14 at k=4 — real
 * corpus-scale sums (token counts at 100 TB) pass that line.
 * Preconditions: num ≥ 0, den > 0, den ≤ (2⁶³−1)/(2·10^k+1) — the tight
 * den bound is property-verified in ExactIntProps (its first run
 * falsified the looser (2⁶³−1)/(2·10^k) at the exact boundary); every
 * call site's den is a group/doc count, ~6 orders inside it.
 *
 * SUM HEADROOM per k (the r16 ADVICE item): [[sumE]] sums e-k LONG
 * codes, so a group wraps (or throws under ANSI) once
 * Σ|codes| > 2⁶³−1 ≈ 9.2e18 — i.e. after ~9.2e18 / (max|x|·10^k)
 * rows. Concretely: TPC-H extendedprice ≤ ~1e5 at k=4 → codes ≤ ~1e9
 * → ~9.2e9 rows PER GROUP; a [0,1]-bounded discount at k=4 → ~9.2e14
 * rows. DuckDB's sum(BIGINT) silently promotes to HUGEINT, so past
 * the line the two engines diverge rather than both failing — the
 * failure mode is cross-engine, not a crash. Rules of thumb when a
 * group's row count can approach the bound (truly unbounded-
 * cardinality money sums at the 100 TB target): use k=2 codes (money
 * is 2-dp; ×100 headroom), or sum into decimal(38,0) —
 * `sum(eRow(x,k).cast("decimal(38,0)"))` — which is exact to 38
 * digits and matches HUGEINT semantics on both engines. Call-site
 * census at the 100 TB design point (lineitem ≈ 6e11 rows): the ONE
 * exposed class was the q1-shape money sum — groups keyed by O(1)
 * cardinality (returnflag × linestatus), so rows-per-group is O(corpus)
 * ≈ 1.5e11 and the e4 disc-price codes (≤ ~1.1e9) sum to ~1.9e20, past
 * the Long line (under Spark 4's default ANSI mode that is a runtime
 * throw; with ANSI off, a silent wrap while DuckDB promotes to HUGEINT
 * — a cross-engine divergence either way). Those sums now ride
 * [[eRow38]]. Every remaining Long-sum site has bounded groups
 * (per-order, per-customer, per-doc keys) or small codes (e2 of
 * [0,1]-bounded or ≤ 50-bounded measures), each ≥ 3 orders inside the
 * bound at 100 TB — and the q1 ratio inputs (_qty_e2 ≤ ~5e3/row,
 * _dsc_e2 ≤ 10/row) stay Long deliberately: sparkRatioE's div/% ride
 * integer arithmetic, and their Σcodes sit ~4 orders inside the line.
 */
object Exact {
  private def p10d(k: Int): Double = math.pow(10, k)

  /** Per-row e-k integer code: floor(x·10^k + 0.5) as LONG
   * (round-half-up; identical in Spark and DuckDB for the same double). */
  def eRow(c: Column, k: Int): Column =
    floor(c * lit(p10d(k)) + lit(0.5)).cast("long")

  /** Deterministic replacement for `round(sum(x), k)`: integer sum of
   * per-row e-k codes, one final IEEE division. */
  def sumE(c: Column, k: Int): Column =
    sum(eRow(c, k)).cast("double") / lit(p10d(k))

  /** [[eRow]] widened for CORPUS-SCALE group sums (the q1 class: money
   * codes summed over groups whose row count is O(corpus)): the e-k
   * code cast to decimal(38,0), so sum() accumulates exactly to 38
   * digits — matching DuckDB's silent BIGINT→HUGEINT promotion — where
   * a Long sum passes 2⁶³−1 around ~1e11 rows of e4 money codes (the
   * 100 TB design point; see the headroom census above). Per-row codes
   * still obey eRow's |x|·10^k < 2⁵³ bound; only the ACCUMULATOR
   * widens. ExactSparkSpec proves the decimal sum equals the BigInt
   * reference past the naive-Long overflow line. */
  def eRow38(c: Column, k: Int): Column =
    eRow(c, k).cast("decimal(38,0)")

  /** SQL twin of [[eRow]] — shared Spark-SQL/DuckDB dialect. */
  def sqlERow(x: String, k: Int): String =
    s"CAST(floor(($x) * 1e$k + 0.5) AS BIGINT)"

  /** Deterministic per-row replacement for `round(x, k)` on a double
   * BOTH engines compute identically (per-row folds, log/exp/sqrt
   * scalars, integer-sum-derived group stats): the e-k half-up integer
   * code, one final IEEE division. Ties resolve toward +∞ (the floor
   * form) by the SAME rule in both engines — `round()`'s tie behavior
   * is engine-defined — and the value equals round(x, k) everywhere off
   * an exact e-k tie. Requires |x|·10^k < 2⁵³ (every call site is a
   * bounded ratio/log/probability scale). */
  def rRow(c: Column, k: Int): Column =
    eRow(c, k).cast("double") / lit(p10d(k))

  /** SQL twin of [[rRow]] — shared Spark-SQL/DuckDB dialect. */
  def sqlRRow(x: String, k: Int): String =
    s"(CAST(${sqlERow(x, k)} AS DOUBLE) / 1e$k)"

  /** SQL twin of [[sumE]] — shared Spark-SQL/DuckDB dialect. */
  def sqlSumE(x: String, k: Int): String =
    s"CAST(sum(${sqlERow(x, k)}) AS DOUBLE) / 1e$k"

  /** Overflow-safe round-half-up e-k code of num/den (integer SQL
   * expressions, num ≥ 0, den > 0) — Spark dialect (`div`). */
  def sparkRatioE(num: String, den: String, k: Int): String = {
    val m = p10d(k).toLong
    s"((($num) div ($den)) * $m + " +
      s"(2 * (($num) % ($den)) * $m + ($den)) div (2 * ($den)))"
  }

  /** DuckDB twin of [[sparkRatioE]] (`//`). */
  def duckRatioE(num: String, den: String, k: Int): String = {
    val m = p10d(k).toLong
    s"((($num) // ($den)) * $m + " +
      s"(2 * (($num) % ($den)) * $m + ($den)) // (2 * ($den)))"
  }

  /** [[sparkRatioE]] as a double-valued Column: the exact e-k rounding of
   * the integer ratio, one final IEEE division. */
  def ratioCol(num: String, den: String, k: Int): Column =
    expr(sparkRatioE(num, den, k)).cast("double") / lit(p10d(k))

  /** DuckDB twin of [[ratioCol]]. */
  def duckRatio(num: String, den: String, k: Int): String =
    s"CAST(${duckRatioE(num, den, k)} AS DOUBLE) / 1e$k"
}
