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

  /** F13 — reassemble uuid-correlated chunks into one logical payload:
   * a binary fold over the chunks' wire bytes in chunk order, exactly the
   * consumer-side buffer concat (ConsumerImpl chunk handling,
   * PulsarApi.proto:160-163). One hash aggregation; `array_sort` orders
   * chunks inside each group without a global sort. Groups missing pieces
   * (buffered count below the declared num_chunks_from_msg) never emit —
   * the consumer discards incomplete chunked messages on expiry. */
  def reassembleChunks(env: DataFrame): DataFrame =
    env.groupBy(col("uuid_group"))
      .agg(
        count(lit(1)).as("num_chunks"),
        min(col("num_chunks")).as("declared_chunks"),
        aggregate(
          transform(
            array_sort(collect_list(struct(col("chunk_id"),
              col("value_bin").as("payload")))),
            c => c.getField("payload")),
          lit(Array.empty[Byte]),
          (acc, x) => concat(acc, x)).as("assembled_bin"),
        min(col("msg_offset")).as("first_offset"))
      .filter(col("num_chunks") === col("declared_chunks"))
      .withColumn("assembled", col("assembled_bin").cast("string"))
      .drop("assembled_bin", "declared_chunks")

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
