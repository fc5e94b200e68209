package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Bin-bucketed range (interval ⋈ point) join.
 *
 * The reference's only interval primitive is one-sided and broker-local:
 * expiry/retention walk the ledger comparing each entry's timestamp
 * against a single cutoff (reference: PersistentMessageExpiryMonitor
 * .java:102). The relational generalization — join every point to every
 * interval containing it — is a core analytics operator Spark's planner
 * turns into a broadcast-nested-loop or cartesian product when written
 * as a bare inequality join, which dies at scale.
 *
 * Shape at 100 TB: quantize the axis into fixed-width bins. Each point
 * falls in exactly ONE bin; each interval is exploded to the bins it
 * overlaps (≈ len/width + 1 rows). The join becomes an EQUI-join on the
 * bin id (hash shuffle both sides, AQE-eligible) with the exact interval
 * predicate as a residual filter — every qualifying (interval, point)
 * pair meets in exactly one bin, so no dedup pass is needed. Pick
 * `binWidth` near the typical interval length: explode factor stays ~2
 * while each bin prunes all but neighbouring points. Degenerate huge
 * intervals (≫ binWidth) explode proportionally — split those few to a
 * broadcast side instead (they match everything anyway).
 */
object RangeJoin {

  /**
   * Join `points` (numeric `pointCol`) to `intervals` (numeric
   * `startCol`/`endCol`, half-open [start, end)) on containment,
   * optionally under equi-`keys` present on both sides. Inputs must be
   * non-null in the range columns; column names must be disjoint apart
   * from `keys`. Returns matched pairs with all columns from both sides.
   */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      startCol: String,
      endCol: String,
      binWidth: Long,
      keys: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val overlap = points.columns.toSet
      .intersect(intervals.columns.toSet)
      .diff(keys.toSet)
    require(overlap.isEmpty, s"non-key columns collide across sides: $overlap")

    val p = points.withColumn("__bin", floor(col(pointCol) / binWidth))
    // Half-open [start, end): the last overlapped bin is the one holding
    // end - 1; an empty interval (end <= start) yields no bins.
    val iv = intervals.withColumn("__bin",
      explode(when(col(endCol) > col(startCol),
        sequence(floor(col(startCol) / binWidth),
          floor((col(endCol) - 1) / binWidth)))))

    val cond = keys.map(k => p(k) === iv(k))
      .reduceOption(_ && _)
      .map(_ && p("__bin") === iv("__bin"))
      .getOrElse(p("__bin") === iv("__bin")) &&
      p(pointCol) >= iv(startCol) && p(pointCol) < iv(endCol)

    (Seq(p("__bin"), iv("__bin")) ++ keys.map(iv(_)))
      .foldLeft(p.join(iv, cond))((df, c) => df.drop(c))
  }

  /**
   * Interval × interval OVERLAP join: pairs of half-open intervals
   * [ls, le) × [rs, re) with `ls < re && rs < le`, each overlapping
   * pair emitted exactly once. Both sides explode to their covering
   * fixed-width bins and equi-join on the bin; a pair overlapping
   * across several shared bins is kept only in the bin containing
   * max(ls, rs) — a point both intervals cover, which lies in exactly
   * one bin — the standard dedup rule that turns the inequality join
   * into an equi-join + residual with no DISTINCT pass.
   *
   * Same 100 TB shape as [[pointInInterval]]: one co-partitioned
   * shuffle on (keys, bin); long intervals cost ceil(len/binWidth)
   * replicas — pick binWidth near the median interval length. A
   * pathological bin is AQE-skew / salting territory.
   */
  def intervalOverlap(
      left: DataFrame,
      right: DataFrame,
      lStart: String, lEnd: String,
      rStart: String, rEnd: String,
      binWidth: Long,
      keys: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val overlap = left.columns.toSet
      .intersect(right.columns.toSet)
      .diff(keys.toSet)
    require(overlap.isEmpty, s"non-key columns collide across sides: $overlap")

    def binned(df: DataFrame, s: String, e: String) =
      df.withColumn("__bin",
        explode(when(col(e) > col(s),
          sequence(floor(col(s) / binWidth), floor((col(e) - 1) / binWidth)))))
    val l = binned(left, lStart, lEnd)
    val r = binned(right, rStart, rEnd)

    val cond = keys.map(k => l(k) === r(k))
      .reduceOption(_ && _)
      .map(_ && l("__bin") === r("__bin"))
      .getOrElse(l("__bin") === r("__bin")) &&
      l(lStart) < r(rEnd) && r(rStart) < l(lEnd) &&
      floor(greatest(l(lStart), r(rStart)) / binWidth) === l("__bin")

    (Seq(l("__bin"), r("__bin")) ++ keys.map(r(_)))
      .foldLeft(l.join(r, cond))((df, c) => df.drop(c))
  }
}
