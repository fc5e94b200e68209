package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Scale-safe per-key running sequences.
 *
 * A bare `Window.partitionBy(lowCardinalityKey).orderBy(...)` moves every
 * message of a key through one task — dead at 100 TB when the key is
 * `topic` (a handful of values). These helpers compute the same running
 * quantities in two levels: the expensive window runs inside
 * (key, block) — high-cardinality, parallel, already clustered in storage
 * (block = ledger) — and only a per-block summary (|blocks| rows,
 * 1/blockSize of the log) pays a per-key prefix scan. The summary join
 * is an equi-join on (key, block), which AQE broadcasts when small.
 */
object Sequencing {

  /**
   * 0-based position of each row within its key group, ordered by
   * (blockCol, orderCol). Requires orderCol unique within a block
   * (MessageId order gives this for free).
   */
  def keyedSequence(env: DataFrame, keyCols: Seq[String], blockCol: String,
      orderCol: String, outCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val blocks = env.groupBy((keyCols :+ blockCol).map(col): _*)
      .agg(count(lit(1)).as("_blk_cnt"))
    val prefixW = Window.partitionBy(keys: _*).orderBy(col(blockCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = blocks.withColumn("_blk_prefix",
      coalesce(sum(col("_blk_cnt")).over(prefixW), lit(0L)))
    val withinW = Window.partitionBy((keyCols :+ blockCol).map(col): _*)
      .orderBy(col(orderCol))
    env.join(offsets, keyCols :+ blockCol)
      .withColumn(outCol,
        col("_blk_prefix") + row_number().over(withinW) - 1)
      .drop("_blk_cnt", "_blk_prefix")
  }

  /**
   * Exclusive running max of `valueExpr` per key in (blockCol, orderCol)
   * order — the watermark shape: for each row, the max over all strictly
   * earlier rows of its key. Two-level like the rest: within-block
   * exclusive max combined with the max of all earlier blocks.
   */
  def keyedRunningMaxExcl(env: DataFrame, keyCols: Seq[String], blockCol: String,
      orderCol: String, valueExpr: Column, outCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val valued = env.withColumn("_val", valueExpr)
    val blocks = valued.groupBy((keyCols :+ blockCol).map(col): _*)
      .agg(max(col("_val")).as("_blk_max"))
    val prefixW = Window.partitionBy(keys: _*).orderBy(col(blockCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = blocks.withColumn("_blk_prefix_max",
      max(col("_blk_max")).over(prefixW))
    val withinW = Window.partitionBy((keyCols :+ blockCol).map(col): _*)
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    valued.join(offsets, keyCols :+ blockCol)
      .withColumn(outCol,
        greatest(coalesce(max(col("_val")).over(withinW), lit(Long.MinValue)),
          coalesce(col("_blk_prefix_max"), lit(Long.MinValue))))
      .withColumn(outCol, when(col(outCol) === Long.MinValue, lit(null)).otherwise(col(outCol)))
      .drop("_val", "_blk_max", "_blk_prefix_max")
  }

  /**
   * Newest-first running sum of `valueExpr` per key (retention-style
   * cumulative size): within-block running sum + the total of all newer
   * blocks.
   */
  def keyedCumSumDesc(env: DataFrame, keyCols: Seq[String], blockCol: String,
      orderCol: String, valueExpr: Column, outCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val sized = env.withColumn("_val", valueExpr)
    val blocks = sized.groupBy((keyCols :+ blockCol).map(col): _*)
      .agg(sum(col("_val")).as("_blk_sum"))
    val prefixW = Window.partitionBy(keys: _*).orderBy(col(blockCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = blocks.withColumn("_blk_prefix",
      coalesce(sum(col("_blk_sum")).over(prefixW), lit(0L)))
    val withinW = Window.partitionBy((keyCols :+ blockCol).map(col): _*)
      .orderBy(col(orderCol).desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    sized.join(offsets, keyCols :+ blockCol)
      .withColumn(outCol, col("_blk_prefix") + sum(col("_val")).over(withinW))
      .drop("_val", "_blk_sum", "_blk_prefix")
  }
}
