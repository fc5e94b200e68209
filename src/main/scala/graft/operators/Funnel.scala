package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Ordered-sequence conversion funnel (signup → view → click → purchase)
 * with GREEDY stage chaining: stage i's timestamp is the user's earliest
 * qualifying event STRICTLY after stage i−1's. The batch form is four
 * chained conditional window minimums sharing ONE user-key exchange
 * (same partitioning, no ordering — Catalyst fuses them into a single
 * Window operator); the streaming twin is the 4-long state machine in
 * [[graft.streaming.StreamingOps.funnelStream]].
 */
object Funnel {

  val stages: Seq[String] = Seq("signup", "view", "click", "purchase")

  /** Per-user chained stage timestamps over `(user_id, event_type, ms)`
   * rows: one output row per user with nullable t1..t4. */
  def stageTimes(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    ev
      .withColumn("t1", min(when(col("event_type") === stages(0), col("ms"))).over(w))
      .withColumn("t2", min(when(col("event_type") === stages(1) &&
        col("ms") > col("t1"), col("ms"))).over(w))
      .withColumn("t3", min(when(col("event_type") === stages(2) &&
        col("ms") > col("t2"), col("ms"))).over(w))
      .withColumn("t4", min(when(col("event_type") === stages(3) &&
        col("ms") > col("t3"), col("ms"))).over(w))
      .groupBy(col("user_id"))
      .agg(first(col("t1")).as("t1"), first(col("t2")).as("t2"),
        first(col("t3")).as("t3"), first(col("t4")).as("t4"))
  }

  /** The 4-stage funnel report over [[stageTimes]]' relation: user
   * counts with exact integer PPM conversion (vs all users) and
   * step-through (vs the previous stage). */
  def report(staged: DataFrame): DataFrame = {
    val f = staged.agg(count(lit(1)).as("n_total"),
      count(col("t1")).as("n1"), count(col("t2")).as("n2"),
      count(col("t3")).as("n3"), count(col("t4")).as("n4"))
    f.select(explode(array(
        struct(lit(1L).as("stage"), lit(stages(0)).as("stage_name"),
          col("n1").as("n_users"), col("n_total").as("prev"), col("n_total")),
        struct(lit(2L).as("stage"), lit(stages(1)).as("stage_name"),
          col("n2").as("n_users"), col("n1").as("prev"), col("n_total")),
        struct(lit(3L).as("stage"), lit(stages(2)).as("stage_name"),
          col("n3").as("n_users"), col("n2").as("prev"), col("n_total")),
        struct(lit(4L).as("stage"), lit(stages(3)).as("stage_name"),
          col("n4").as("n_users"), col("n3").as("prev"), col("n_total"))
      )).as("st"))
      .select(col("st.stage").as("stage"), col("st.stage_name").as("stage_name"),
        col("st.n_users").as("n_users"),
        expr("CASE WHEN st.n_total > 0 THEN (st.n_users * 1000000) div st.n_total" +
          " ELSE 0 END").as("conv_ppm"),
        expr("CASE WHEN st.prev > 0 THEN (st.n_users * 1000000) div st.prev" +
          " ELSE 0 END").as("step_ppm"))
      .orderBy(col("stage"))
  }
}
