package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * S17 — replicated-subscription cursor synchronization: the marker
 * protocol that keeps a subscription's position consistent across
 * geo-replicated clusters (reference: `PulsarMarkers.proto:29-32` —
 * SNAPSHOT_REQUEST/RESPONSE/SNAPSHOT/UPDATE marker types;
 * `ReplicatedSubscriptionsController.java:60` and
 * `ReplicatedSubscriptionsSnapshotBuilder.java:39-146`;
 * `ReplicatedSubscriptionSnapshotCache.java:336` — snapshot selection on
 * mark-delete advance).
 *
 * Protocol rules folded here, each replayed relationally:
 *  - A snapshot attempt opens with a SNAPSHOT_REQUEST; every remote
 *    cluster answers with a SNAPSHOT_RESPONSE carrying its last local
 *    message id. With more than one remote the source runs TWO request
 *    rounds (SnapshotBuilder:71-74), and a cluster's STORED position is
 *    its FIRST response — `responses.putIfAbsent`
 *    (SnapshotBuilder:90-97) — regardless of round.
 *  - The snapshot completes at the marker position of the last required
 *    response (`needed`-th response of the slowest remote); its local
 *    position is that entry. A builder whose completion would land past
 *    the timeout has already been dropped by the timer — status
 *    `timed_out`; missing responses → `incomplete` (also a timeout in
 *    the broker; kept distinct here because the relation can see why).
 *  - As the local subscription's mark-delete position advances
 *    (monotonically, as a cursor does), the HIGHEST completed snapshot
 *    at or below the new position is applied and everything below it
 *    pruned (SnapshotCache.advancedMarkDeletePosition); each new
 *    running-max snapshot emits one UPDATE whose per-cluster positions
 *    are what the mirrored cursors seek to — `upd_seq` is that emission
 *    order, and the highest applied row IS the final synced cursor set.
 *
 * Scale shape: marker relations are a control-plane slice of the topic
 * (the F10 marker filter yields them); snapshots, responses, and
 * advances are schedule-scale, so every join here is broadcast-trivial
 * next to the data path. The single-partition rank over distinct
 * running maxima is bounded by the number of UPDATEs ever emitted.
 *
 * Output: one row per (snapshot attempt, remote cluster) —
 * (snapshot_id, status, local_entry, upd_seq, cluster, stored_pos) with
 * stored_pos = ledger·10⁶ + entry, surfaced only for completed
 * snapshots (the SNAPSHOT marker's clusters map).
 */
object ReplicatedSubscription {

  /**
   * @param markers  (seq, ts_ms, mtype ∈ {REQUEST, RESPONSE}, sid,
   *                 cluster, r_ledger, r_entry) — the topic's
   *                 replicated-subscription marker slice in position
   *                 order (seq doubles as the marker's local entry id)
   * @param advances (adv_seq, md_entry) — the local subscription's
   *                 monotone mark-delete advances
   */
  def sync(markers: DataFrame, advances: DataFrame, remotes: Seq[String],
      timeoutMs: Long): DataFrame = {
    require(remotes.nonEmpty && timeoutMs > 0)
    val spark = markers.sparkSession
    import spark.implicits._
    val needed = if (remotes.size > 1) 2 else 1
    val req = markers.filter(col("mtype") === "REQUEST")
      .groupBy(col("sid")).agg(min(col("ts_ms")).as("req_ts"))
    val resp = markers.filter(col("mtype") === "RESPONSE")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("sid"), col("cluster")).orderBy(col("seq"))))
    val stored = resp.filter(col("rn") === 1)
      .select(col("sid"), col("cluster"),
        (col("r_ledger") * 1000000L + col("r_entry")).as("stored_pos"))
    val completion = resp
      .filter(col("rn") === needed && col("cluster").isInCollection(remotes))
      .groupBy(col("sid"))
      .agg(countDistinct(col("cluster")).as("n_done"),
        max(col("seq")).as("done_seq"), max(col("ts_ms")).as("done_ts"))
    val census = req.join(completion, Seq("sid"), "left")
      .withColumn("status",
        when(col("n_done") === remotes.size &&
          col("done_ts") - col("req_ts") <= timeoutMs, "completed")
          .when(col("n_done") === remotes.size, "timed_out")
          .otherwise("incomplete"))
      .withColumn("local_entry",
        when(col("status") === "completed", col("done_seq")))
      .select(col("sid"), col("status"), col("local_entry"))
    // each advance's best eligible snapshot; every NEW running max (the
    // advances are monotone, so distinct bests ARE the running maxima)
    // emits one UPDATE, in best order
    val best = advances.join(census.filter(col("status") === "completed"),
        col("local_entry") <= col("md_entry"))
      .groupBy(col("adv_seq")).agg(max(col("local_entry")).as("best_entry"))
      .select(col("best_entry")).distinct()
      .withColumn("upd_seq",
        row_number().over(Window.orderBy(col("best_entry"))).cast("long"))
    census
      .join(best, census("local_entry") === best("best_entry"), "left")
      .crossJoin(remotes.toDF("cluster"))
      .join(stored, Seq("sid", "cluster"), "left")
      .select(col("sid").as("snapshot_id"), col("status"),
        col("local_entry"), col("upd_seq"), col("cluster"),
        when(col("status") === "completed", col("stored_pos"))
          .as("stored_pos"))
  }
}
