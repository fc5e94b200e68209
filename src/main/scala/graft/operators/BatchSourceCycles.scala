package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * U11 — the BatchSource discovery→trigger→ingest lifecycle as a
 * batch-checkable relation (reference:
 * `pulsar-functions/instance/.../batch/BatchSourceExecutor.java:52-58`
 * — discovery runs on instance 0, discovered tasks flow through an
 * intermediate topic to all instances on a shared subscription;
 * `:164-183` — a trigger that fires while a discovery is in progress is
 * SKIPPED (`discoverInProgress`); `pulsar-io/batch-discovery-triggerers/
 * CronTriggerer.java` — fires on a fixed schedule).
 *
 * Model: cron fires at t0 + k·period (k = 1, 2, …). An accepted fire
 * discovers every source record that arrived since the LAST accepted
 * fire and its discovery stays busy `perTaskMs` per discovered task;
 * fires landing inside the busy window are dropped (the
 * `discoverInProgress` rule), so backlogs cascade into wider windows —
 * exactly the behavior the executor's guard produces under a slow
 * `discover()`. Fires continue past the log's horizon until every record
 * has been ingested. Discovered tasks spread round-robin over the
 * instances in task-id order — a declared, checkable stand-in for the
 * shared subscription's nondeterministic work stealing (the s2b
 * keyless round-robin precedent).
 *
 * Shape at 100 TB: slot assignment and per-slot counts are ONE corpus
 * hash aggregate; the fold itself runs on the collected slot counts — a
 * SCHEDULE-scale relation (one row per cron period spanned by the log),
 * bounded and driver-side by design, like the repo's other control-plane
 * folds. Task→cycle mapping is an equi-join against the broadcast
 * slot→cycle table (never a range join against the corpus), and the
 * per-cycle digest/spread is one cycle-keyed window + hash aggregate
 * (cycle cardinality is schedule-scale; a pathological single-cycle
 * skew would call for the two-level sequence, as in sharedSpread).
 */
object BatchSourceCycles {

  /** One accepted discovery cycle: covers source slots (kLo, kHi]. */
  final case class Cycle(cycle: Int, kLo: Long, kHi: Long, fireMs: Long,
    nDropped: Long)

  /** The explicit schedule-scale bound: the driver-side fold iterates
   * once per cron period from t0 until the log drains, and the
   * slot→cycle broadcast holds one row per period — both are bounded by
   * the SCHEDULE, not the corpus, and this cap makes that binding choice
   * checked instead of silent. A pathological cron (a 1-second period
   * over a year is ~31M slots) fails fast with the span/period in the
   * message rather than ballooning the driver. 1M slots ≈ 11 days of
   * 1-second cron or ~114 years of 1-hour cron — far past any real
   * BatchSource schedule. */
  val MaxSlots: Long = 1000000L

  /**
   * The trigger fold over per-slot record counts. Slot k holds records
   * with ms in (t0 + (k−1)·period, t0 + k·period], EXCEPT that the
   * boundary record at exactly t0 (which always exists — t0 is the min)
   * joins slot 1: the assignment rule is ((ms − t0 − 1) div period) + 1,
   * truncating, identical under Spark `div` and DuckDB `//`. Pure and
   * schedule-scale; the oracle replays it with a recursive CTE.
   */
  def fold(slotCounts: Map[Long, Long], periodMs: Long, perTaskMs: Long,
      t0: Long): Seq[Cycle] = {
    val total = slotCounts.values.sum
    var ingested = 0L
    var busyUntil = Long.MinValue
    var la = 0L // last accepted fire's k
    var drops = 0L
    var k = 0L
    var cycleNo = 0
    val out = Seq.newBuilder[Cycle]
    while (ingested < total) {
      k += 1
      require(k <= MaxSlots,
        s"BatchSourceCycles: the trigger fold passed $MaxSlots cron " +
          s"periods without draining (period=${periodMs}ms, " +
          s"perTask=${perTaskMs}ms) — the schedule-scale bound the " +
          "driver-side fold relies on does not hold for this cron")
      val fire = t0 + k * periodMs
      if (fire < busyUntil) drops += 1
      else {
        val n = ((la + 1) to k).iterator
          .map(slotCounts.getOrElse(_, 0L)).sum
        if (n > 0) {
          cycleNo += 1
          out += Cycle(cycleNo, la, k, fire, drops)
          busyUntil = fire + perTaskMs * n
          la = k
          ingested += n
          drops = 0L
        }
      }
    }
    out.result()
  }

  /**
   * The full relation over a (record_id, ms) source log: one row per
   * accepted cycle with its fire time, the fires dropped by
   * `discoverInProgress` since the previous cycle, the discovered task
   * count, the round-robin per-instance spread, and the membership
   * digest (md5 of the comma-joined record ids in id order).
   */
  def cycles(records: DataFrame, idCol: String, msCol: String,
      periodMs: Long, perTaskMs: Long, instances: Int): DataFrame = {
    require(periodMs > 0 && perTaskMs >= 0 && instances > 0)
    val spark = records.sparkSession
    import spark.implicits._
    val e = records.select(col(idCol).as("rid"),
      col(msCol).cast("long").as("ms"))
    // 1-row bound collect: the schedule origin; an EMPTY source log has
    // no schedule at all → the empty relation (the oracle's recursive
    // CTE with total = 0 likewise emits no cycles)
    val t0Row = e.agg(min(col("ms")), max(col("ms"))).head()
    if (t0Row.isNullAt(0)) {
      val inst = (0 until instances).map(i => lit(0L).as(s"n_i$i"))
      return e.limit(0).select(Seq(lit(0).as("cycle"),
        lit(0L).as("fire_ms"), lit(0L).as("n_dropped"),
        lit(0L).as("n_tasks")) ++ inst :+
        lit("").as("tasks_md5"): _*)
    }
    val t0 = t0Row.getLong(0)
    // the span guard runs BEFORE the slot-count collect: under a
    // pathological period the non-empty slots approach one per record,
    // so the collect itself would be corpus-scale — fail on the
    // schedule's span/period instead
    val spanSlots = (t0Row.getLong(1) - t0 - 1) / periodMs + 1
    require(spanSlots <= MaxSlots,
      s"BatchSourceCycles: the log spans $spanSlots cron periods " +
        s"(period=${periodMs}ms) — past the $MaxSlots schedule-scale " +
        "bound the slot-count collect and trigger fold rely on")
    val slotted = e.withColumn("k",
      expr(s"((ms - ${t0}L - 1) div ${periodMs}L) + 1"))
    // schedule-scale collect: one row per cron period spanned by the log
    val counts = slotted.groupBy(col("k")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cyc = fold(counts, periodMs, perTaskMs, t0)
    val slotToCycle = broadcast(
      cyc.flatMap(c => ((c.kLo + 1) to c.kHi).map(_ -> c.cycle))
        .toDF("k", "cycle"))
    val cycDf = broadcast(cyc.map(c => (c.cycle, c.fireMs, c.nDropped))
      .toDF("cycle", "fire_ms", "n_dropped"))
    val rn = row_number().over(
      Window.partitionBy(col("cycle")).orderBy(col("rid")))
    val instSums = (0 until instances).map(i =>
      sum(when(col("inst") === i, 1L).otherwise(0L)).as(s"n_i$i"))
    val aggs = Seq(count(lit(1)).as("n_tasks")) ++ instSums :+
      md5(concat_ws(",", transform(sort_array(collect_list(col("rid"))),
        _.cast("string")))).as("tasks_md5")
    slotted.join(slotToCycle, Seq("k"))
      .withColumn("inst", (rn - 1) % instances)
      .groupBy(col("cycle"))
      .agg(aggs.head, aggs.tail: _*)
      .join(cycDf, Seq("cycle"))
      .select(Seq(col("cycle").cast("int").as("cycle"), col("fire_ms"),
        col("n_dropped"), col("n_tasks")) ++
        (0 until instances).map(i => col(s"n_i$i")) :+ col("tasks_md5"): _*)
  }
}
