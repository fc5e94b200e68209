package graft.operators

import graft.functions.GraftFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Routing / partitioning algebra — the reference's "shuffle".
 *
 * Reference semantics: producers choose a partition per message (round-robin
 * for keyless, murmur3(key) % n for keyed — RoundRobinPartitionMessageRouterImpl
 * .java:74, Murmur3Hash32.java:44); Key_Shared dispatch assigns each key a
 * 16-bit hash bucket and maps bucket ranges to consumers
 * (StickyKeyConsumerSelectorUtils.java:42, KeySharedPolicy.java:40-96).
 */
object Routing {

  /** R1 — round-robin router for keyless messages. In a distributed write
   * this is `repartition(n)`; the deterministic batch form assigns
   * offset % n so results are reproducible. */
  def roundRobin(env: DataFrame, numPartitions: Int): DataFrame =
    env.withColumn("route_partition", (col("msg_offset") % numPartitions).cast("int"))

  /** R2 — key-hash router: murmur3(key, seed=0) % n, exact parity with the
   * reference's hash (Spark's hash() uses seed 42 — wrong constant). */
  def keyHash(env: DataFrame, numPartitions: Int): DataFrame =
    env.withColumn("route_partition", keyHashPartition(col("key"), numPartitions))

  /** R3 — single-partition router (all keyless traffic to one partition). */
  def singlePartition(env: DataFrame, thePartition: Int): DataFrame =
    env.withColumn("route_partition", lit(thePartition))

  /** R4 — custom MessageRouter SPI: the user supplies choosePartition as
   * an arbitrary column expression over the message
   * (pulsar-client-api/.../MessageRouter.java); distributed write =
   * `repartition(n, expr)`. */
  def customRouter(env: DataFrame, choosePartition: org.apache.spark.sql.Column): DataFrame =
    env.withColumn("route_partition", choosePartition.cast("int"))

  /** R5/R8 — Key_Shared sticky bucket: 16-bit ring position of the
   * effective key — ordering_key (bytes) overrides key
   * (PulsarApi.proto:141); murmur3 of a string hashes its UTF-8 bytes, so
   * the coalesce over `encode(key)` is exact parity. */
  def stickyBucket(env: DataFrame): DataFrame =
    env.withColumn("sticky_bucket",
      keySharedBucket(coalesce(col("ordering_key"), encode(col("key"), "UTF-8"))))

  /**
   * R5-R7 — assign messages to consumers by hash-range: ranges is a small
   * dimension (consumer, lo, hi) broadcast to every task, so the range join
   * never shuffles the message side.
   */
  def assignConsumers(env: DataFrame, ranges: DataFrame): DataFrame = {
    val b = stickyBucket(env)
    b.join(broadcast(ranges),
      col("sticky_bucket") >= col("lo") && col("sticky_bucket") <= col("hi"),
      "left")
  }

  /** R6 — evenly split the 16-bit ring across n consumers (the auto-split
   * steady state). */
  def evenRanges(spark: org.apache.spark.sql.SparkSession, consumers: Int): DataFrame = {
    import spark.implicits._
    val size = 65536
    (0 until consumers).map { i =>
      val lo = i * size / consumers
      val hi = (i + 1) * size / consumers - 1
      (s"consumer-$i", lo, hi)
    }.toDF("consumer", "lo", "hi")
  }

  /**
   * R9 — PIP-486 entry-bucketing: whole entries routed by 16-bit bucket;
   * in Spark this is key-range partitioning, giving row-group locality.
   */
  def entryBucketed(env: DataFrame, buckets: Int): DataFrame =
    stickyBucket(env).repartitionByRange(buckets, col("sticky_bucket"))

  /** R10 — Exclusive/Failover: one active consumer per partition; on the
   * active consumer's failure (a cutover point in the log) the next
   * standby takes over — order preserved within the partition
   * (PersistentDispatcherSingleActiveConsumer). */
  def failover(env: DataFrame, failoverAtOffset: Long): DataFrame =
    env.withColumn("consumer",
      when(col("msg_offset") < failoverAtOffset, "consumer-0").otherwise("consumer-1"))

  /** R10 — Shared-subscription fair spread: work-queue assignment of
   * messages to n consumers, order not preserved across consumers. The
   * per-partition sequence is two-level ([[Sequencing.keyedSequence]]) so
   * a 4-value partition_id never serializes the log through 4 tasks. */
  def sharedSpread(env: DataFrame, consumers: Int): DataFrame =
    Sequencing.keyedSequence(env, Seq("partition_id"), "ledger_id", "msg_offset", "_seq")
      .withColumn("consumer", concat(lit("consumer-"), col("_seq") % consumers))
      .drop("_seq")
}
