package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions.minKPairs

/** The bounded map-side top-k aggregate must select EXACTLY the rows a
 * (dist, dst)-ordered row_number window keeps — including ties — and
 * survive the partial/merge path (forced via repartition). */
class MinKPairsSpec extends AnyFunSuite {
  import TestSpark._

  private def viaAgg(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy(col("g"))
      .agg(minKPairs(struct(col("dist"), col("dst")), k).as("tk"))
      .select(col("g"), explode(col("tk")).as("p"))
      .select(col("g"), col("p.dist").as("dist"), col("p.dst").as("dst"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def viaWindow(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.withColumn("rn", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("dist"), col("dst"))))
      .filter(col("rn") <= k)
      .select(col("g"), col("dist"), col("dst"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("matches the window selection on pseudo-random data with ties") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    // small dist domain forces ties; 40 partitions force merges
    val rows = (0 until 5000).map(_ =>
      (rnd.nextInt(7).toLong, rnd.nextInt(12).toLong, rnd.nextInt(1000).toLong))
    val df = rows.distinct.toDF("g", "dist", "dst").repartition(40)
    for (k <- Seq(1, 3, 16, 100))
      assert(viaAgg(df, k) === viaWindow(df, k), s"k=$k")
  }

  test("groups with fewer than k rows return all rows, in rank order") {
    import spark.implicits._
    val df = Seq((1L, 5L, 9L), (1L, 2L, 7L), (2L, 1L, 1L)).toDF("g", "dist", "dst")
    val out = df.groupBy(col("g"))
      .agg(minKPairs(struct(col("dist"), col("dst")), 10).as("tk"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(p => (p.getLong(0), p.getLong(1))))
      .toMap
    assert(out(1L) === Seq((2L, 7L), (5L, 9L)))
    assert(out(2L) === Seq((1L, 1L)))
  }

  test("SET form (dedup) equals .distinct() + window on duplicate-rich data") {
    import spark.implicits._
    import graft.functions.GraftFunctions.minKPairsDistinct
    val rnd = new scala.util.Random(47)
    // tiny domains force heavy exact duplicates AND (dist, dst) ties;
    // 40 partitions force the partial/merge path through serialization
    val rows = (0 until 8000).map(_ =>
      (rnd.nextInt(5).toLong, rnd.nextInt(6).toLong, rnd.nextInt(9).toLong))
    val df = rows.toDF("g", "dist", "dst").repartition(40)
    for (k <- Seq(1, 3, 7, 64)) {
      val viaSet = df.groupBy(col("g"))
        .agg(minKPairsDistinct(struct(col("dist"), col("dst")), k).as("tk"))
        .select(col("g"), explode(col("tk")).as("p"))
        .select(col("g"), col("p.dist").as("dist"), col("p.dst").as("dst"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(viaSet === viaWindow(df.distinct(), k), s"k=$k")
    }
  }

  test("null structs and null fields are skipped") {
    import spark.implicits._
    val df = Seq((1L, Some(3L), Some(4L)), (1L, None, Some(5L)),
      (1L, Some(2L), None)).toDF("g", "dist", "dst")
    val out = df.groupBy(col("g"))
      .agg(minKPairs(struct(col("dist"), col("dst")), 10).as("tk"))
      .collect()(0).getSeq[org.apache.spark.sql.Row](1)
    assert(out.map(p => (p.getLong(0), p.getLong(1))) === Seq((3L, 4L)))
  }

  test("SQL surface: min_k_pairs registered and literal-k checked") {
    GraftSql.register(spark)
    import spark.implicits._
    Seq((1L, 2L, 3L)).toDF("g", "dist", "dst")
      .createOrReplaceTempView("mkp_t")
    val out = spark.sql(
      "SELECT min_k_pairs(struct(dist, dst), 5) AS tk FROM mkp_t GROUP BY g")
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
    assert(out.map(p => (p.getLong(0), p.getLong(1))) === Seq((2L, 3L)))
  }
}
