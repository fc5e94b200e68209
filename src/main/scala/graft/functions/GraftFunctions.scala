package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.functions._

/** Column-level entry points for the engine's custom expressions. */
object GraftFunctions {

  /** Non-negative murmur3-32 (seed 0 by default — the reference's routing hash). */
  def murmur3Positive(c: Column, seed: Int = 0): Column =
    GraftSqlBridge.column(Murmur3Positive(GraftSqlBridge.expression(c), seed))

  /**
   * Key_Shared 16-bit sticky-key bucket: murmur3(key) mod 2^16
   * (reference: KeySharedPolicy.java:40 `DEFAULT_HASH_RANGE_SIZE = 2 << 15`,
   * StickyKeyConsumerSelectorUtils.java:42).
   */
  def keySharedBucket(key: Column): Column =
    pmod(murmur3Positive(key), lit(65536)).cast("int")

  /** Keyed-router partition choice: murmur3(key) mod numPartitions (R2). */
  def keyHashPartition(key: Column, numPartitions: Int): Column =
    pmod(murmur3Positive(key), lit(numPartitions)).cast("int")
}
