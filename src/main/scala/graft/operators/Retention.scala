package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Weekly retention cohorts over `(user_id, day)` activity rows: users
 * grouped by the week of their first event, and for every later week
 * the fraction still active. All epoch-day/week arithmetic is integer
 * division. The batch relation here is the single source of truth the
 * q30 query AND the streaming twin's convergence check both consume —
 * [[graft.streaming.StreamingOps.retentionStream]] emits exactly one
 * row per [[cells]] row under ordered arrival.
 */
object Retention {

  /** Distinct (cohort_week, offset_week, user_id) activity cells. Every
   * user has an offset-0 cell (their first event), so the cohort's size
   * IS its offset-0 active count. */
  def cells(ev: DataFrame): DataFrame = {
    val cohort = ev.groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort_day"))
    ev.join(cohort, Seq("user_id"))
      .select(expr("cohort_day div 7").as("cohort_week"),
        expr("(day - cohort_day) div 7").as("offset_week"), col("user_id"))
      .distinct()
  }

  /** The cohort × offset matrix with exact integer PPM retention. */
  def matrix(ev: DataFrame): DataFrame = {
    val c = cells(ev)
    val sizes = c.filter(col("offset_week") === 0)
      .groupBy(col("cohort_week")).agg(count(lit(1)).as("cohort_size"))
    c.groupBy(col("cohort_week"), col("offset_week"))
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(sizes), Seq("cohort_week"))
      .withColumn("retention_ppm", expr("(n_active * 1000000) div cohort_size"))
      .select(col("cohort_week"), col("offset_week"), col("n_active"),
        col("cohort_size"), col("retention_ppm"))
      .orderBy(col("cohort_week"), col("offset_week"))
  }
}
