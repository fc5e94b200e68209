package graft.streaming

import graft.operators.TimeWindows
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * W7 — streaming late-data side output.
 *
 * Reference semantics: the windowing function executor keeps a per-topic
 * watermark (max seen event time − lag) and routes records whose event
 * time is already below it to a configured side topic instead of silently
 * dropping them (reference: pulsar-functions/instance/src/main/java/org/
 * apache/pulsar/functions/windowing/WindowFunctionExecutor.java
 * processWindow/isEventLate lifecycle + WaterMarkEventGenerator.java, with
 * the topic name from WindowConfig.java:41 `lateDataTopic`).
 *
 * Spark-first: Structured Streaming's own watermark silently DROPS late
 * rows inside the stateful aggregation, so the dual-write has to happen
 * before the aggregation sees the batch — a `foreachBatch` router that
 * labels each micro-batch with the SAME batch operator the w6/w7 oracle
 * queries use ([[TimeWindows.withLateness]]), seeded with the per-topic
 * high-water marks carried from earlier batches. Convergence with the
 * batch twin is therefore structural: same operator, same order, the seed
 * row standing in for the whole prefix of the log.
 */
object LateData {

  /**
   * Per-topic high-water event times carried across micro-batches — the
   * reference's WaterMarkEventGenerator state: one long per input topic,
   * held in memory (the reference holds it in the function instance and
   * rebuilds by re-reading on restart; a checkpointed restart here replays
   * unprocessed batches the same way).
   */
  final class WatermarkState {
    private val max = scala.collection.mutable.Map.empty[String, Long]
    def snapshot: Map[String, Long] = max.synchronized(max.toMap)
    def update(tops: Seq[(String, Long)]): Unit = max.synchronized {
      tops.foreach { case (t, m) =>
        max.updateWith(t)(prev => Some(prev.fold(m)(math.max(_, m)))); ()
      }
    }
  }

  /**
   * Dual-write router: on-time rows append to `mainDir`, late rows to
   * `lateDir` (the `-LATE` side topic). Each micro-batch pays one labeling
   * join on (topic, msg_offset) — micro-batch-sized, not log-sized.
   */
  def routeStream(env: DataFrame, lagMs: Long, mainDir: String,
      lateDir: String, checkpointDir: String): (StreamingQuery, WatermarkState) = {
    val state = new WatermarkState
    val q = env.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        batch.persist()
        try {
          // One seed row per already-seen topic, ordered before every real
          // row: the batch operator then sees the carried watermark as
          // "earlier data" and labels the batch's first rows correctly.
          val seeds = state.snapshot.toSeq.toDF("topic", "event_ms")
            .withColumn("ledger_id", lit(Long.MinValue))
            .withColumn("msg_offset", lit(Long.MinValue))
          val cols = Seq("topic", "ledger_id", "msg_offset", "event_ms")
          val labeled = TimeWindows.withLateness(
            batch.select(cols.map(col): _*)
              .unionByName(seeds.select(cols.map(col): _*)), lagMs)
            .filter(col("msg_offset") =!= Long.MinValue)
            .select(col("topic").as("_t"), col("msg_offset").as("_o"),
              col("is_late"))
          val routed = batch.join(labeled,
            col("topic") === col("_t") && col("msg_offset") === col("_o"))
            .drop("_t", "_o").persist()
          routed.filter(!col("is_late")).drop("is_late")
            .write.mode("append").parquet(mainDir)
          routed.filter(col("is_late")).drop("is_late")
            .write.mode("append").parquet(lateDir)
          state.update(batch.groupBy(col("topic"))
            .agg(max(col("event_ms")).as("m")).as[(String, Long)].collect().toSeq)
          routed.unpersist(); ()
        } finally { batch.unpersist(); () }
      }
      .start()
    (q, state)
  }
}
