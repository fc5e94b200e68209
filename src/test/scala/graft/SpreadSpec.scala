package graft

import graft.pipeline.Spread
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Spread.ifNarrow]]'s CONDITIONAL contract (r20 verdict item 3):
 * the pre-compute spread exists for narrow gate-scale scans only — a
 * relation already at (or past) the session parallelism floor must pass
 * through with NO added exchange, so the 100 TB design point never pays
 * a corpus-scale text shuffle for fixture-shape parallelism. */
class SpreadSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val floor =
    spark.conf.get("spark.sql.shuffle.partitions").toInt // 4 in tests

  test("narrow input gains the keyed spread up to the parallelism floor") {
    val narrow = (1L to 40L).map(i => (i, s"doc $i")).toDF("id", "text")
      .coalesce(1)
    val out = Spread.ifNarrow(narrow, col("id"))
    assert(out.rdd.getNumPartitions === floor)
    // hash-partitioned on the key, visible as a repartition exchange
    assert(out.queryExecution.executedPlan.toString.contains("hashpartitioning"))
    // content unchanged
    assert(out.select(sum(col("id"))).head.getLong(0) === (1L to 40L).sum)
  }

  test("input at or past the floor passes through untouched (same plan)") {
    val wide = (1L to 40L).map(i => (i, s"doc $i")).toDF("id", "text")
      .repartition(floor + 2, col("id"))
    val out = Spread.ifNarrow(wide, col("id"))
    // no new exchange: the returned relation IS the input
    assert(out.rdd.getNumPartitions === floor + 2)
    assert(out.queryExecution.logical eq wide.queryExecution.logical)
  }
}
