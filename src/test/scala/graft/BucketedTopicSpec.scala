package graft

import graft.sources.GraftIO
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The point of bucketed topic storage is the PLAN, not the answer: a
 * key-join between same-bucketed tables and a key-aggregation must run
 * with ZERO shuffle exchanges (the bucketed scan already provides
 * HashPartitioning). Values are also checked against the direct
 * formulation. */
class BucketedTopicSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(tag: String): String = Scratch.clearDir(s"bucket-$tag")

  private def exchanges(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect() // materialize so AQE settles on the final plan
    df.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Exchange"))
  }

  test("key-agg and key-join over bucketed topics are exchange-free") {
    val rows = TestSpark.env((0L until 400L).map(i =>
      (i, s"p${i % 3}", i * 37 % 1000, (i % 20).toString, i * 0.5, 1000000L + i, false, None)))
    GraftIO.writeBucketedTopic(
      rows.select(col("key"), col("msg_offset"), col("value")),
      "bspec_log", tmp("log"), Seq("key"), 4, sortCols = Seq("key"))
    GraftIO.writeBucketedTopic(
      rows.groupBy(col("key")).agg(max(col("msg_offset")).as("head_offset")),
      "bspec_dim", tmp("dim"), Seq("key"), 4, sortCols = Seq("key"))
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a real join (broadcast would dodge the shuffle trivially)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val agg = spark.table("bspec_log").groupBy("key")
        .agg(count(lit(1)).as("n"), sum("value").as("s"))
      assert(exchanges(agg) === 0, "groupBy(key) over a bucketed topic must not shuffle")
      val joined = spark.table("bspec_log").join(spark.table("bspec_dim"), "key")
        .groupBy("key").agg(count(lit(1)).as("n"), max("head_offset").as("h"))
      assert(exchanges(joined) === 0, "co-bucketed key-join must not shuffle")
      // and the answers match the direct formulation
      val direct = rows.groupBy("key").agg(count(lit(1)).as("n"), sum("value").as("s"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      val viaBucket = agg.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(viaBucket === direct)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS bspec_log")
      spark.sql("DROP TABLE IF EXISTS bspec_dim")
    }
  }
}
