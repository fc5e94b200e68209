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

  /**
   * The DEPLOYED LSH-index shape minhashAppendStep's scaladoc promises:
   * the persisted band-bucket table written `bucketBy(band, band_hash)`
   * removes the per-batch INDEX exchange from the probe join — only the
   * (small) batch side shuffles into the index's bucketing. Asserted
   * structurally on the physical plan: the SortMergeJoin's index child
   * contains ZERO shuffle exchanges while the batch child contains the
   * one expected exchange — and the probe's candidate pairs equal the
   * unbucketed probe's exactly.
   */
  test("bucketed persisted LSH index: probe plans zero exchange on the index side") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // plain physical plan (no AQE wrapper) so the per-side subtree walk
    // below sees the real exchanges rather than opaque query stages
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val dir = java.nio.file.Files.createTempDirectory("graft-lsh-bucket-")
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val base = graft.pipeline.DedupOps.lshIndexOf(
      docs.filter(col("doc_id") % 10 =!= 5), "doc_id", "text", isBase = true)
    val batch = graft.pipeline.DedupOps.lshIndexOf(
      docs.filter(col("doc_id") % 10 === 5), "doc_id", "text",
      isBase = false)
    try {
      base.banded.write.bucketBy(8, "band", "band_hash")
        .sortBy("band", "band_hash")
        .option("path", s"$dir/banded_b").saveAsTable("lsh_banded_b")
      def probeOf(idx: org.apache.spark.sql.DataFrame) =
        batch.banded.as("a").join(idx.as("b"),
          col("a.band") === col("b.band") &&
            col("a.band_hash") === col("b.band_hash") &&
            col("b.doc") =!= col("a.doc"))
          .select(col("a.doc").as("doc_id"), col("b.doc").as("partner"))
          .distinct()
      val probe = probeOf(spark.table("lsh_banded_b"))
      def stripAqe(p: SparkPlan): SparkPlan = p match {
        case a: AdaptiveSparkPlanExec => stripAqe(a.executedPlan)
        case other => other
      }
      val smj = stripAqe(probe.queryExecution.executedPlan).collectFirst {
        case j: SortMergeJoinExec => j
      }.getOrElse(fail(
        s"probe must sort-merge join:\n${probe.queryExecution.executedPlan}"))
      def exchanges(p: SparkPlan) = p.collect { case e: ShuffleExchangeLike => e }
      // the index is the join's right side (`.as("b")` above)
      assert(exchanges(smj.right).isEmpty,
        s"bucketed index side must not shuffle:\n${smj.right}")
      assert(exchanges(smj.left).nonEmpty,
        s"batch side shuffles into the index bucketing:\n${smj.left}")
      assert(smj.right.toString.contains("Bucketed: true") ||
        smj.right.toString.contains("SelectedBucketsCount"), smj.right.toString)
      // parity: bucketing changes the plan, never the candidate set
      val got = probe.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      val want = probeOf(base.banded).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(got.nonEmpty && got.sameElements(want),
        s"bucketed=${got.length} unbucketed=${want.length}")
    } finally {
      spark.sql("DROP TABLE IF EXISTS lsh_banded_b")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
    }
  }
}
