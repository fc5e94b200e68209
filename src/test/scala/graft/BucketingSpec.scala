package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Bucketed-table co-location — the 100 TB contract the charter's
 * "pre-partition what you join repeatedly" rule rests on, proven in
 * the EXECUTED plan rather than claimed: two tables bucketed on the
 * same key join with ZERO exchanges (each bucket pair joins in place —
 * on a 1000-executor cluster that is the difference between a network
 * shuffle of the fact table per join and none), and a bucketed
 * aggregation on the bucket key needs no exchange either. This is the
 * deployment shape for the envelope log and its per-key dimensions
 * (subscription state, routing tables): bucket both once at write
 * time, join for free forever after.
 */
class BucketingSpec extends AnyFunSuite {
  import TestSpark.spark

  private def withTables(body: => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("graft-bucket-")
    val events = spark.read
      .parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("user_id"), col("event_id"), col("value"))
    val users = events.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total"))
    try {
      events.write.bucketBy(8, "user_id").sortBy("user_id")
        .option("path", s"$dir/events_b").saveAsTable("events_b")
      users.write.bucketBy(8, "user_id").sortBy("user_id")
        .option("path", s"$dir/users_b").saveAsTable("users_b")
      body
    } finally {
      spark.sql("DROP TABLE IF EXISTS events_b")
      spark.sql("DROP TABLE IF EXISTS users_b")
    }
  }

  test("same-bucketing join and bucket-key agg run with zero exchanges") {
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // force the join to be non-broadcast so co-location (not broadcast)
    // is what removes the shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try withTables {
      val joined = spark.table("events_b")
        .join(spark.table("users_b"), Seq("user_id"))
      val jp = joined.queryExecution.executedPlan.toString
      assert(!jp.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$jp")
      assert(jp.contains("SortMergeJoin"), jp)
      assert(jp.contains("SelectedBucketsCount") || jp.contains("Bucketed: true"), jp)
      // and the result is the same relation the unbucketed join computes
      val unbucketed = spark.read
        .parquet("/root/testdata/sf0.001/events.parquet")
        .select(col("user_id"), col("event_id"), col("value"))
      val want = unbucketed.join(
        unbucketed.groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total")),
        Seq("user_id")).count()
      assert(joined.count() === want)

      // bucket-key aggregation: no exchange before the final agg either
      val agg = spark.table("events_b").groupBy(col("user_id"))
        .agg(sum(col("value")).as("s"))
      val ap = agg.queryExecution.executedPlan.toString
      assert(!ap.contains("Exchange"),
        s"bucket-key aggregation must not shuffle:\n$ap")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
    }
  }
}
