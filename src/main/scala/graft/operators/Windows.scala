package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Windowed aggregation — the reference's Pulsar Functions windowing
 * (pulsar-functions/instance/.../windowing/): tumbling/sliding × time/count,
 * watermark = min(per-topic max event time) − maxLagMs
 * (WaterMarkEventGenerator.java:113-123), late data diverted to a side
 * topic (WindowConfig.java:41). No session windows exist in the reference.
 *
 * Time windows are Spark's native `window()` (epoch-aligned, exactly the
 * trigger semantics of WatermarkTimeTriggerPolicy); count windows have no
 * Spark built-in and are expressed as row_number arithmetic in batch and
 * flatMapGroupsWithState in streaming (graft.streaming).
 */
object TimeWindows {

  private def eventTs: Column = timestamp_millis(col("event_ms"))

  /** W1/W4 — tumbling event-time window aggregation. */
  def tumbling(env: DataFrame, windowMs: Long, aggs: Seq[Column], groupCols: Seq[Column] = Nil): DataFrame =
    env.groupBy(window(eventTs, s"$windowMs milliseconds") +: groupCols: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start_ms", unix_millis(col("window.start")))
      .drop("window")

  /** W2 — sliding event-time window aggregation (each row lands in
   * length/slide windows; Spark's window() explodes them natively). */
  def sliding(env: DataFrame, lengthMs: Long, slideMs: Long, aggs: Seq[Column]): DataFrame =
    env.groupBy(window(eventTs, s"$lengthMs milliseconds", s"$slideMs milliseconds"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start_ms", unix_millis(col("window.start")))
      .drop("window")

  /**
   * W2 processing-time variant — the reference's TimeTriggerPolicy and
   * TimeEvictionPolicy fire on WALL-CLOCK time
   * (pulsar-functions/instance/.../windowing/triggers/TimeTriggerPolicy
   * .java), windowing messages by arrival instant, not event time. The
   * engine's deterministic processing clock is `publish_ms` — the
   * broker-stamped receipt time — so results are reproducible across
   * re-runs (the reference has the same redelivery-shifts-windows
   * property). The streaming twin runs the same groupBy under
   * `Trigger.ProcessingTime` (StreamingOps.processingTimeCounts).
   */
  def processingTumbling(env: DataFrame, windowMs: Long, aggs: Seq[Column]): DataFrame =
    env.groupBy(window(timestamp_millis(col("publish_ms")), s"$windowMs milliseconds"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start_ms", unix_millis(col("window.start")))
      .drop("window")

  /** W2 processing-time sliding window (see [[processingTumbling]]). */
  def processingSliding(env: DataFrame, lengthMs: Long, slideMs: Long,
      aggs: Seq[Column]): DataFrame =
    env.groupBy(window(timestamp_millis(col("publish_ms")),
        s"$lengthMs milliseconds", s"$slideMs milliseconds"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start_ms", unix_millis(col("window.start")))
      .drop("window")

  /** W3 — count-based tumbling window per key: every N messages of a key
   * form one window (CountTriggerPolicy/CountEvictionPolicy). */
  def countTumblingPerKey(env: DataFrame, n: Int, aggs: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(col("key")).orderBy(col("msg_offset"))
    env.withColumn("window_id", ((row_number().over(w) - 1) / n).cast("long"))
      .groupBy(col("key"), col("window_id"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** W3 sliding — count window length L slide S over the whole log:
   * row i (0-based, MessageId order) belongs to window starts
   * s ∈ {ceil((i-L+1)/S)*S .. floor(i/S)*S}; generated with `sequence` —
   * a narrow explode, no self-join. */
  def countSliding(env: DataFrame, length: Int, slide: Int, aggs: Seq[Column],
      indexCol: Column = col("msg_offset")): DataFrame = {
    // The row index comes from the data model, not a global window: the
    // envelope's msg_offset IS the dense 0-based log position (a
    // no-partition Window.orderBy would drag the entire log through one
    // task). Callers with a non-dense order pass their own dense index
    // (e.g. Sequencing.keyedSequence over a constant key).
    val indexed = env.withColumn("_i", indexCol)
    val loJ = greatest(
      ceil((col("_i") - length + 1).cast("double") / slide).cast("long"), lit(0L))
    val hiJ = floor(col("_i").cast("double") / slide).cast("long")
    indexed
      .withColumn("_j", explode(sequence(loJ, hiJ)))
      .withColumn("window_start", col("_j") * slide)
      .groupBy(col("window_start"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /**
   * W6/W7 — watermark + late-data side output, batch emulation of the
   * reference's per-topic watermark generator: after row r of a topic, the
   * topic's watermark is (max event_ms among the topic's rows strictly
   * before r) − lagMs; a row is late when its event time is below that
   * already-emitted watermark. (When a function consumes several topics the
   * reference takes min across topics — composable here by taking the min
   * of the per-topic columns.) Returns the input plus
   * (watermark_ms, is_late).
   */
  def withLateness(env: DataFrame, lagMs: Long): DataFrame =
    // Two-level running max (Sequencing.keyedRunningMaxExcl): the per-topic
    // watermark scan parallelizes over (topic, ledger) blocks instead of
    // dragging each topic through one task.
    Sequencing.keyedRunningMaxExcl(env, Seq("topic"), "ledger_id",
      "msg_offset", col("event_ms"), "_topic_max")
      .withColumn("watermark_ms",
        when(col("_topic_max").isNotNull, col("_topic_max") - lagMs))
      .withColumn("is_late",
        coalesce(col("event_ms") < col("watermark_ms"), lit(false)))
      .drop("_topic_max")

  /** W7 — the late-data side topic. */
  def lateData(env: DataFrame, lagMs: Long): DataFrame =
    withLateness(env, lagMs).filter(col("is_late"))
}
