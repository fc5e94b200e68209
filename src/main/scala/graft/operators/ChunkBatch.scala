package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Chunked-message reassembly and batch-entry explode/repack.
 *
 * Reference semantics: messages larger than the broker limit are split into
 * uuid-correlated chunks (PulsarApi.proto:160-163, consumer-side reassembly
 * in ConsumerImpl); batch entries pack N messages into one stored entry with
 * per-message SingleMessageMetadata and an ack bitset
 * (PulsarApi.proto:64,126,187-198).
 */
object ChunkBatch {

  /** F13 — reassemble uuid-correlated chunks into one logical payload.
   * One hash aggregation; `sort_array` orders chunks inside each group
   * without a global sort. */
  def reassembleChunks(env: DataFrame): DataFrame = {
    // Chunk payload rendered as an exact integer (value ×100) — double→string
    // formatting is engine-specific, integers are not.
    val payload = round(col("value") * 100).cast("long").cast("string").as("payload")
    env.groupBy(col("uuid_group"))
      .agg(
        count(lit(1)).as("num_chunks"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("chunk_id"), payload))),
            c => c.getField("payload")),
          "|").as("assembled"),
        min(col("msg_offset")).as("first_offset"))
  }

  /** F14a — pack messages into batch entries keyed by (topic, ledger_id):
   * the producer-side batch container (BatchMessageContainerImpl). */
  def packBatches(env: DataFrame): DataFrame =
    env.groupBy(col("topic"), col("ledger_id"))
      .agg(sort_array(collect_list(struct(col("msg_offset"), col("key"), col("value")))).as("batch"),
        count(lit(1)).as("num_messages_in_batch"))

  /** F14b — explode batch entries back into messages with their
   * batch_index (posexplode ≈ SingleMessageMetadata unpacking). */
  def explodeBatches(batches: DataFrame): DataFrame =
    batches.select(col("topic"), col("ledger_id"),
        posexplode(col("batch")).as(Seq("batch_index", "msg")))
      .select(col("topic"), col("ledger_id"), col("batch_index"),
        col("msg.msg_offset").as("msg_offset"), col("msg.key").as("key"),
        col("msg.value").as("value"))

  /** F14 roundtrip — pack then explode; proves index/order preservation. */
  def batchRoundtrip(env: DataFrame): DataFrame =
    explodeBatches(packBatches(env))
}
