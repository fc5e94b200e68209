package graft.streaming

import graft.model.MessageEnvelope
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer

/** One TableView entry (latest value per key). */
case class TableViewEntry(value: Double, publish_ms: Long, msg_offset: Long)

/**
 * The client-side latest-value-per-key map the streaming TableView
 * maintains — the Spark twin of the reference's ConcurrentMap-backed view
 * (reference: pulsar-client/.../impl/TableViewImpl.java:49-166): tailing
 * upserts, tombstone deletes, and change listeners (`forEachAndListen`,
 * TableViewImpl.java:208). Holding the map client-side is the operator's
 * definition, not a scale bug — its size is |keys|, and the heavy work
 * (per-key latest) runs distributed in the update-mode aggregation that
 * feeds it.
 */
final class TableView {
  private val map = TrieMap.empty[String, TableViewEntry]
  private val listeners = ArrayBuffer.empty[(String, Option[TableViewEntry]) => Unit]

  def upsert(key: String, e: TableViewEntry): Unit = {
    map.put(key, e); listeners.foreach(_(key, Some(e)))
  }
  def remove(key: String): Unit = {
    map.remove(key); listeners.foreach(_(key, None))
  }
  def get(key: String): Option[TableViewEntry] = map.get(key)
  def snapshot: Map[String, TableViewEntry] = map.toMap
  def size: Int = map.size
  /** forEachAndListen: replay current state, then subscribe to changes. */
  def forEachAndListen(f: (String, Option[TableViewEntry]) => Unit): Unit = {
    map.foreach { case (k, v) => f(k, Some(v)) }
    listeners += f
  }
}

object StreamingOps {

  /**
   * A5 streaming — TableView over an envelope stream: distributed
   * update-mode `max_by` per key keeps only changed keys per micro-batch;
   * foreachBatch applies the (key-sized) delta to the client map. Matches
   * the batch Compaction.tableView on the same data.
   */
  def tableViewStream(env: DataFrame, checkpointDir: String): (StreamingQuery, TableView) = {
    val view = new TableView
    val latest = env.filter(col("marker_type").isNull)
      .groupBy(col("key"))
      .agg(max_by(
        struct(col("value"), col("publish_ms"), col("msg_offset"), col("tombstone")),
        col("msg_offset")).as("m"))
      .select(col("key"), col("m.value").as("value"), col("m.publish_ms").as("publish_ms"),
        col("m.msg_offset").as("msg_offset"), col("m.tombstone").as("tombstone"))
    val query = latest.writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.collect().foreach { r =>
          val k = r.getAs[String]("key")
          if (r.getAs[Boolean]("tombstone")) view.remove(k)
          else view.upsert(k, TableViewEntry(r.getAs[Double]("value"),
            r.getAs[Long]("publish_ms"), r.getAs[Long]("msg_offset")))
        }
      }
      .start()
    (query, view)
  }

  /**
   * F5 streaming — producer-dedup with keyed state: per producer, the
   * state is the highest sequence id persisted (exactly the broker's
   * `highestSequencedPushed` map, MessageDeduplication.java:112); a
   * message survives iff its sequence id exceeds it. Rows within a
   * micro-batch are ordered by msg_offset before the state walk (the
   * iterator order is not otherwise guaranteed).
   */
  def dropReplaysStream(env: Dataset[MessageEnvelope]): Dataset[MessageEnvelope] = {
    import env.sparkSession.implicits._
    env.groupByKey(_.producer_name)
      .flatMapGroupsWithState[Long, MessageEnvelope](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: String, rows: Iterator[MessageEnvelope], state: GroupState[Long]) =>
          var maxSeq = state.getOption.getOrElse(Long.MinValue)
          val out = rows.toSeq.sortBy(_.msg_offset).filter { m =>
            val keep = m.sequence_id > maxSeq
            if (keep) maxSeq = m.sequence_id
            keep
          }
          state.update(maxSeq)
          out.iterator
      }
  }

  /**
   * F5 streaming (built-in variant) — near-dup suppression keyed on
   * (producer, sequence) within a watermark: Spark's native
   * dropDuplicatesWithinWatermark, the bounded-state form for exact
   * replays (same sequence id re-sent, the common at-least-once case).
   */
  def dropExactReplaysStream(env: DataFrame, watermarkDelay: String): DataFrame =
    env.withColumn("publish_ts", timestamp_millis(col("publish_ms")))
      .withWatermark("publish_ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("producer_name", "sequence_id")

  /**
   * W1/W4/W6 streaming — event-time tumbling window with watermark; with
   * complete output the final result equals the batch TimeWindows.tumbling
   * on the same data.
   */
  def tumblingCounts(env: DataFrame, windowMs: Long, watermarkDelay: String): DataFrame =
    env.withColumn("event_ts", timestamp_millis(col("event_ms")))
      .withWatermark("event_ts", watermarkDelay)
      .groupBy(window(col("event_ts"), s"$windowMs milliseconds"), col("topic"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_v"))
      .withColumn("window_start_ms", unix_millis(col("window.start")))
      .drop("window")

  /** Run a streaming DataFrame to a named in-memory table until all
   * currently-available input is processed. */
  def runToMemory(df: DataFrame, name: String, mode: OutputMode,
      checkpointDir: String): StreamingQuery =
    df.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
