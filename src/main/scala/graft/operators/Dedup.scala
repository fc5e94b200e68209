package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Producer-idempotency deduplication.
 *
 * Reference semantics: the broker rejects a message whose sequence id does
 * not exceed the highest sequence id already persisted for that producer
 * (reference: pulsar-broker/.../persistent/MessageDeduplication.java:112-123);
 * a snapshot of the per-producer max is persisted periodically (:266-269).
 *
 * The running-max is inherently sequential per producer but parallel across
 * producers — `Window.partitionBy(producer)` shuffles once on the producer
 * key and scales with the number of producers.
 */
object Dedup {

  /** F5 — keep only messages whose sequence id beats the producer's running max. */
  def dropReplays(env: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("producer_name")).orderBy(col("msg_offset"))
      .rowsBetween(Window.unboundedPreceding, -1)
    env.withColumn("_prev_max_seq", max(col("sequence_id")).over(w))
      .filter(col("_prev_max_seq").isNull || col("sequence_id") > col("_prev_max_seq"))
      .drop("_prev_max_seq")
  }

  /** A8 — dedup snapshot: highest persisted sequence id per producer. */
  def snapshot(env: DataFrame): DataFrame =
    dropReplays(env)
      .groupBy(col("producer_name"))
      .agg(max(col("sequence_id")).as("highest_sequence_persisted"),
        count(lit(1)).as("persisted_count"))
}
