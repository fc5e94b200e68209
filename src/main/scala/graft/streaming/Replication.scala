package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * S14 — geo-replication as an actual second delivery path, the reference's
 * PersistentReplicator/GeoPersistentReplicator behavior (reference:
 * pulsar-broker/src/main/java/org/apache/pulsar/broker/service/persistent/
 * PersistentReplicator.java, GeoPersistentReplicator.java): a replicator
 * tails the local topic and re-delivers every locally-originated message to
 * the remote cluster with `replicated_from` stamped to the origin cluster;
 * messages that already carry a `replicated_from` (they arrived FROM a
 * remote cluster) are not replicated onward — the loop break that keeps a
 * mesh of clusters from echoing messages forever.
 */
object Replication {

  /** The outbound slice: locally-originated messages, stamped with their
   * origin cluster for the remote copy. */
  def outbound(env: DataFrame, localCluster: String): DataFrame =
    env.filter(col("replicated_from").isNull)
      .withColumn("replicated_from", lit(localCluster))

  /**
   * Dual-sink replicating tail: one streaming source, two topic-dir sinks.
   * Each micro-batch lands once in the local topic (verbatim) and once in
   * the remote topic (loop-break filtered + origin-stamped). The batch is
   * persisted so the two writes share one evaluation — at scale this is
   * the replicator reading each entry once and fanning out.
   */
  def replicateStream(env: DataFrame, localCluster: String, localDir: String,
      remoteDir: String, checkpointDir: String): StreamingQuery =
    env.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.persist()
        try {
          batch.write.mode("append").parquet(localDir)
          outbound(batch, localCluster).write.mode("append").parquet(remoteDir)
        } finally { batch.unpersist(); () }
      }
      .start()
}
