package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Transactional visibility.
 *
 * Reference semantics: messages produced inside a transaction stay invisible
 * until the COMMIT marker; the topic transaction buffer keeps an
 * aborted-transaction snapshot used to filter dispatch (reference:
 * pulsar-broker/.../transaction/buffer/impl/TopicTransactionBuffer.java,
 * markers PulsarApi.proto:149-153).
 *
 * Spark mapping: visibility is a semi/anti join of the envelope's txn id
 * against the coordinator's status table. The status table is tiny
 * (one row per transaction) — broadcast, so visibility adds no shuffle.
 */
object Transactions {

  /** T3 — only non-transactional messages and messages of committed
   * transactions are visible. */
  def visible(env: DataFrame, txnStatus: DataFrame): DataFrame = {
    val aborted = txnStatus.filter(col("status") === "ABORTED").select(col("txn_id"))
    env.join(broadcast(aborted), col("txn_group") === col("txn_id"), "left_anti")
  }

  /** T3 inverse — messages swallowed by aborted transactions. */
  def abortedMessages(env: DataFrame, txnStatus: DataFrame): DataFrame = {
    val aborted = txnStatus.filter(col("status") === "ABORTED").select(col("txn_id"))
    env.join(broadcast(aborted), col("txn_group") === col("txn_id"), "left_semi")
  }

  /** T2 — coordinator status ledger derived deterministically for the
   * fixture: every 4th txn group aborts. */
  def fixtureStatus(env: DataFrame): DataFrame =
    env.filter(col("txn_group").isNotNull)
      .select(col("txn_group").as("txn_id")).distinct()
      .withColumn("status", when(col("txn_id") % 4 === 0, "ABORTED").otherwise("COMMITTED"))
}
