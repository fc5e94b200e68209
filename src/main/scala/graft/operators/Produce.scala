package graft.operators

import graft.functions.GraftFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The produce path — S1 (Producer.send) and S2 (TypedMessageBuilder).
 *
 * Reference flow: the builder stamps envelope fields (TypedMessageBuilder
 * .java:96-214), a router picks the partition — keyed messages by
 * murmur3(key) % n, keyless round-robin
 * (RoundRobinPartitionMessageRouterImpl.java:74) — the broker stamps
 * sequence/ledger/entry ids and rejects replays
 * (MessageDeduplication.java:112-123), then the entry is durably written.
 *
 * Spark-first: stamping is pure column arithmetic over a caller-named
 * order column, so ids are deterministic and reproducible (no
 * monotonically_increasing_id, no driver state); the per-partition entry
 * sequence and the global sequence use the two-level [[Sequencing]]
 * helpers, so no task ever sorts the whole batch; durability is the
 * Parquet append (the BookKeeper-quorum replacement).
 */
object Produce {

  /**
   * S2 — build envelope messages from a raw batch with columns
   * (`orderCol`, key STRING nullable, value DOUBLE, optional event_ms,
   * optional properties). Keyed rows route murmur3(key) % n; keyless rows
   * round-robin on their global position. `deliverAfterMs` > 0 sets the
   * delayed-delivery timestamp (TypedMessageBuilder.deliverAfter).
   */
  def build(batch: DataFrame, topic: String, producerName: String,
      numPartitions: Int, orderCol: String, nowMs: Long,
      startOffset: Long = 0L, startSeq: Long = 0L,
      deliverAfterMs: Long = 0L, ledgerSize: Long = 1000L,
      allKeyed: Boolean = false): DataFrame = {
    val withBlk = batch
      .withColumn("_blk", (col(orderCol) / ledgerSize).cast("long"))
    val sequenced =
      if (allKeyed) buildKeyedSequences(withBlk, numPartitions, orderCol)
      else {
        // keyless round-robin routes on the global position, so the
        // sequencing has to happen in two rounds: global first, then
        // per-routed-partition
        val global = Sequencing.globalSequence(withBlk, "_blk", orderCol, "_g")
        val routed = global.withColumn("_pt",
          when(col("key").isNotNull, keyHashPartition(col("key"), numPartitions))
            .otherwise(pmod(col("_g"), lit(numPartitions)).cast("int")))
        Sequencing.keyedSequence(routed, Seq("_pt"), "_blk", orderCol, "_entry")
      }
    val eventMs = if (batch.columns.contains("event_ms")) col("event_ms") else lit(nowMs)
    val props = if (batch.columns.contains("properties")) col("properties") else lit("{}")
    // MessageId is per-partition (ledger, entry): ledgers roll every
    // `ledgerSize` entries WITHIN a partition and entry ids reset per
    // ledger, matching the reference's checkpointable (ledger, entry)
    // coordinates (MessageIdImpl.java).
    sequenced.select(
      lit(topic).as("topic"),
      col("_pt").as("partition_id"),
      (col("_entry") / ledgerSize).cast("long").as("ledger_id"),
      (col("_entry") % ledgerSize).as("entry_id"),
      lit(0).as("batch_index"),
      (col("_g") + startOffset).as("msg_offset"),
      lit(producerName).as("producer_name"),
      (col("_g") + startSeq).as("sequence_id"),
      lit(nowMs).as("publish_ms"),
      eventMs.as("event_ms"),
      col("key").cast("string").as("key"),
      col("value").cast("double").as("value"),
      // wire payload: the v0 JSON record of the schema lattice (see
      // graft.schema.PayloadCodec) serialized to UTF-8 bytes
      encode(concat(
        lit("{\"amount_c\":"),
        floor(col("value").cast("double") * 100).cast("long").cast("string"),
        lit(s""","origin":"$producerName"}""")), "UTF-8").as("value_bin"),
      props.as("properties"),
      lit(0L).as("schema_version"),
      lit(nowMs + deliverAfterMs).as("deliver_at_ms"),
      lit(null).cast("int").as("marker_type"),
      lit(null).cast("string").as("replicated_from"),
      lit(null).cast("long").as("txn_group"),
      lit(0).as("attempts"),
      (col("_g") + startOffset).as("uuid_group"),
      lit(0).as("chunk_id"),
      lit(false).as("tombstone"),
      lit(null).cast("binary").as("ordering_key"),
      concat(lit(s"$topic-"), col("_g") + startOffset).as("uuid"),
      lit(1).as("num_chunks"),
      lit(false).as("compacted_out"))
  }

  /**
   * All-keyed fast path: when every row is keyed (a keyed producer's
   * batch, the reference's common case), the route is key-pure, so BOTH
   * sequences — global `_g` and per-partition `_entry` — derive from ONE
   * cached (partition, block) count summary: two broadcast offset joins
   * and two partitioned window passes over a single scan of the batch,
   * instead of the two-round chain the keyless router forces.
   */
  private def buildKeyedSequences(withBlk: DataFrame, numPartitions: Int,
      orderCol: String): DataFrame = {
    val routed = withBlk.withColumn("_pt", keyHashPartition(col("key"), numPartitions))
    val summary = graft.CacheScope.track(
      routed.groupBy(col("_blk"), col("_pt"))
        .agg(count(lit(1)).as("_n")))
    val gOff = Sequencing.exclusiveBlockPrefix(
      summary.groupBy(col("_blk")).agg(sum(col("_n")).as("_val")),
      Seq.empty, "_blk", isMax = false, desc = false, "_gpfx", persistInput = false)
    val pOff = Sequencing.exclusiveBlockPrefix(
      summary.select(col("_pt"), col("_blk"), col("_n").as("_val")),
      Seq("_pt"), "_blk", isMax = false, desc = false, "_ppfx", persistInput = false)
    val wG = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_blk")).orderBy(col(orderCol))
    val wP = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_pt"), col("_blk")).orderBy(col(orderCol))
    // Both offset relations are block-count-sized; pre-joining them on _blk
    // means the batch pays ONE broadcast join instead of two.
    val offs = pOff.join(gOff.select(col("_blk"), col("_gpfx")), Seq("_blk"))
    routed.join(broadcast(offs), Seq("_pt", "_blk"))
      .withColumn("_g", col("_gpfx") + row_number().over(wG) - 1)
      .withColumn("_entry", col("_ppfx") + row_number().over(wP) - 1)
      .drop("_gpfx", "_ppfx")
  }

  /**
   * F5 at the write boundary — drop messages the topic has already
   * persisted: intra-batch replays first, then anti-filter against the
   * existing per-producer high-water snapshot (a producer-count-sized
   * broadcast, exactly the broker's `highestSequencedPushed` map).
   */
  def dedupAgainst(newMsgs: DataFrame, existing: DataFrame): DataFrame = {
    // `existing` was written through this same dedup gate, so it holds no
    // replays — the broker's recovery of `highestSequencedPersisted` from
    // an already-deduplicated ledger is a plain per-producer max
    // (MessageDeduplication.recoverSequenceIdsMap), not the full replay
    // scan Dedup.snapshot does over an arbitrary log.
    val snap = existing.groupBy(col("producer_name"))
      .agg(max(col("sequence_id")).as("highest_sequence_persisted"))
      .select(col("producer_name").as("_p"),
        col("highest_sequence_persisted").as("_hi"))
    Dedup.dropReplays(newMsgs)
      .join(broadcast(snap), col("producer_name") === col("_p"), "left")
      .filter(col("_hi").isNull || col("sequence_id") > col("_hi"))
      .drop("_p", "_hi")
  }

  /** S1 — durable append of built messages to the topic table. */
  def append(msgs: DataFrame, topicDir: String): Unit =
    msgs.write.mode("append").parquet(topicDir)

  /** S1 + F5 — append with dedup-on-write: replays of already-persisted
   * (producer, sequence) pairs are rejected, like the broker's
   * isDuplicate check before asyncAddEntry. Returns appended count. */
  def appendDedup(spark: SparkSession, msgs: DataFrame, topicDir: String): Long = {
    val files = new java.io.File(topicDir).listFiles()
    val exists = files != null && files.nonEmpty
    val toWrite =
      if (exists) dedupAgainst(msgs, spark.read.parquet(topicDir))
      else Dedup.dropReplays(msgs)
    // single evaluation: the accepted-count (the producer's ack) rides the
    // durable write as an observed metric, so the dedup plan never runs a
    // second pass and nothing has to be cached
    val obs = org.apache.spark.sql.Observation()
    toWrite.observe(obs, count(lit(1)).as("n")).write.mode("append").parquet(topicDir)
    obs.get("n").asInstanceOf[Long]
  }

  /** AUTO_PRODUCE_BYTES append (Schema.java:450-462): raw `value_bin`
   * payloads are validated against the topic's CURRENT registered schema
   * at the write boundary — schema-invalid rows never reach the log, the
   * valid remainder goes through the normal dedup-on-write gate. Returns
   * (appended, schemaRejected). The verdict is a columnar expression
   * ([[graft.schema.PayloadCodec.autoProduceOk]]) evaluated inside the
   * same scan as the write; the rejected count is observed on a second
   * pass over only the rejected slice (producer-ack bookkeeping, not a
   * data-path cost). */
  def appendAutoProduce(spark: SparkSession, msgs: DataFrame,
      topicDir: String,
      current: org.apache.spark.sql.types.StructType): (Long, Long) = {
    val ok = graft.schema.PayloadCodec.autoProduceOk(col("value_bin"), current)
    val appended = appendDedup(spark, msgs.filter(ok), topicDir)
    val rejected = msgs.filter(!ok).count()
    (appended, rejected)
  }
}
