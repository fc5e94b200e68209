package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * O6b — the dispatch-rate token bucket as a batch-checkable relation
 * (reference: `pulsar-broker/.../qos/AsyncTokenBucket.java:53-120` — a
 * deterministic token-bucket counter: tokens accrue at `rate` per
 * `ratePeriod` with a carried nanosecond remainder so rounding error
 * never drifts, the balance is clamped to `capacity` at each update
 * BEFORE the consume is subtracted, balances may go NEGATIVE (consumes
 * are never refused — the sign is the throttle signal), and
 * `calculateThrottlingDuration` (`:282-298`) returns the floor-division
 * time to refill to `max(1, targetAmountOfTokensAfterThrottling)`, with
 * the default target capacity/100 (`FinalRateAsyncTokenBucket.java:27`);
 * `DispatchRateLimiterAsyncTokenBucketImpl.java` wires one bucket per
 * message-rate and byte-rate quota, and its `isRelativeToPublishRate`
 * mode derives the rate dynamically from the topic's own publish rate;
 * the CAS/LongAdder machinery around all of this is concurrency
 * plumbing, not semantics).
 *
 * Model: per key (topic/subscription), requests ordered by (ts, ord)
 * fold through tokens_i = min(tokens_{i−1} + Δaccrual_i, cap) − c_i,
 * where cumulative accrual at time t is floor((t − t0)·rate/period) —
 * the drift-free ideal the reference's remainder-carry implements
 * (t0 = the key's first request, where the reference's constructor-time
 * `getTokens()` call pins `lastNanos`).
 *
 * Spark-first shape: the clamped fold has a CLOSED FORM — substituting
 * v_i = tokens_i − (addCum_i − S_i) turns the recurrence into a running
 * minimum, v_i = min(init, min_{j≤i}(cap + S_{j−1} − addCum_j)) — so
 * the whole bucket is ONE prefix-sum + ONE prefix-min window over a
 * single key-partitioned sort, never a driver-side loop. All products
 * run in DECIMAL(38,0) (the p110/q38 convention): a year-scale span
 * times a byte rate would wrap a BIGINT silently.
 *
 * Shape at 100 TB: one exchange on the bucket key, stacked window
 * passes sharing that sort, then pure per-row arithmetic — the same
 * plan class as q34's sessionizer. Keys are topics/subscriptions
 * (control-plane cardinality); per-key request history is the only
 * row-scale dimension and it never leaves its partition.
 */
object TokenBucket {

  /** Fixed-rate bucket configuration (the FinalRateAsyncTokenBucket
   * shape). `targetAfterThrottle < 0` selects the reference default,
   * capacity/100. */
  final case class Params(rate: Long, periodMs: Long, capacity: Long,
      initialTokens: Long, targetAfterThrottle: Long = -1L) {
    require(rate > 0 && periodMs > 0 && capacity > 0 && initialTokens >= 0)
  }

  /**
   * Per-request balances under a fixed rate: one output row per request
   * with `tokens_after` (the balance after this consume; negative =
   * over-consumed), `throttled` (the containsTokens() == false signal:
   * tokens_after ≤ 0), and `throttle_ms` (0 when the balance already
   * covers the refill target, else the floor-division refill time).
   */
  def balances(log: DataFrame, keyCol: Column, tsCol: Column,
      ordCol: Column, consumeCol: Column, p: Params): DataFrame = {
    val required = math.max(1L,
      if (p.targetAfterThrottle >= 0) p.targetAfterThrottle
      else p.capacity / 100)
    core(log, keyCol, tsCol, ordCol, consumeCol,
      lit(p.rate), lit(p.periodMs), lit(p.capacity), lit(p.initialTokens),
      lit(required))
  }

  /**
   * Per-request balances in the `isRelativeToPublishRate` mode: each
   * key's rate is its OWN observed throughput (total consumed per
   * observed span), its capacity a `burstFraction`-of-span accrual
   * budget (floored at `minCapacity` so a tiny key still has a bucket),
   * and its initial balance half the capacity. A key consuming at a
   * steady rate never throttles at ANY data scale; bursts beyond the
   * budget throttle — which is the point of the relative mode, and what
   * makes the fold's behavior scale-invariant.
   */
  def balancesRelative(log: DataFrame, keyCol: Column, tsCol: Column,
      ordCol: Column, consumeCol: Column, burstFraction: Long,
      minCapacity: Long): DataFrame = {
    require(burstFraction > 0 && minCapacity > 0)
    val wk = Window.partitionBy(col("k"))
    val pre = log.select(keyCol.as("k"), tsCol.cast("long").as("tms"),
        ordCol.as("ord"), consumeCol.cast("long").as("c"))
      // a key whose every request consumes 0 still needs a positive
      // rate for the refill division — clamp to 1 token/span
      .withColumn("rate_c", greatest(sum(col("c")).over(wk), lit(1L)))
      .withColumn("period_c",
        greatest(max(col("tms")).over(wk) - min(col("tms")).over(wk), lit(1L)))
      .withColumn("cap_c",
        greatest(expr(s"rate_c div ${burstFraction}L"), lit(minCapacity)))
    core(pre, col("k"), col("tms"), col("ord"), col("c"),
      col("rate_c"), col("period_c"), col("cap_c"),
      expr("cap_c div 2"), greatest(expr("cap_c div 100"), lit(1L)))
  }

  /** The shared closed-form fold; rate/period/capacity/init/required may
   * be per-row columns (constant within a key). */
  private def core(log: DataFrame, keyCol: Column, tsCol: Column,
      ordCol: Column, consumeCol: Column, rate: Column, period: Column,
      capacity: Column, init: Column, required: Column): DataFrame = {
    val w = Window.partitionBy(col("k")).orderBy(col("tms"), col("ord"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    log
      .select(keyCol.as("k"), tsCol.cast("long").as("tms"),
        ordCol.as("ord"), consumeCol.cast("long").as("c"),
        rate.cast("long").as("rate"), period.cast("long").as("period"),
        capacity.cast("long").as("cap"), init.cast("long").as("init"),
        required.cast("long").as("req"))
      .withColumn("t0", min(col("tms")).over(Window.partitionBy(col("k"))))
      // cumulative accrual, clamp-free: floor((t − t0)·rate/period)
      .withColumn("add_cum", expr(
        "(CAST(tms - t0 AS DECIMAL(38,0)) * rate) div period"))
      .withColumn("s_run", sum(col("c")).over(wRun))
      // v_j's argument: cap + S_{j−1} − addCum_j (S before this consume)
      .withColumn("v_arg", col("cap").cast("decimal(38,0)") +
        (col("s_run") - col("c")) - col("add_cum"))
      .withColumn("v", least(col("init").cast("decimal(38,0)"),
        min(col("v_arg")).over(wRun)))
      .withColumn("tokens_dec", col("add_cum") - col("s_run") + col("v"))
      .withColumn("tokens_after", col("tokens_dec").cast("long"))
      .withColumn("throttled", col("tokens_dec") <= 0)
      .withColumn("throttle_ms", expr(
        "CASE WHEN tokens_dec >= req THEN 0L ELSE " +
          "CAST(((req - tokens_dec) * period) div rate AS BIGINT) END"))
      .select(col("k"), col("tms"), col("ord"), col("c"),
        col("tokens_after"), col("throttled"), col("throttle_ms"))
  }
}
