package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Scale-safe per-key running sequences.
 *
 * A bare `Window.partitionBy(lowCardinalityKey).orderBy(...)` moves every
 * message of a key through one task — dead at 100 TB when the key is
 * `topic` (a handful of values), and Catalyst folds a CONSTANT key away
 * entirely ("No Partition Defined" = the whole input in one task). These
 * helpers compute running quantities in levels that are all partitioned:
 *
 *   1. the expensive window runs inside (key, block) — high-cardinality,
 *      parallel, already clustered in storage (block = ledger);
 *   2. per-block summaries (|blocks| rows, 1/blockSize of the log) fold
 *      within `bucketWidth`-sized block ranges — windows partitioned by
 *      (key, bucket), still parallel even for one hot key;
 *   3. only bucket totals — |blocks|/bucketWidth rows, ~100 rows for
 *      100 TB of log at 1k-entry ledgers and 2^20-block buckets — pay one
 *      window per key over that ~100-row relation: the single-task window
 *      holds exactly the rows a broadcast of the totals would have shipped
 *      to every executor anyway, at a third of the exchanges.
 *
 * The summary join back to the log is an equi-join on (key, block), which
 * AQE broadcasts when small.
 */
object Sequencing {

  private val BucketWidth = 1L << 20

  /**
   * Exclusive prefix fold of `_val` over earlier (later when `desc`)
   * blocks of the same key — the level-2/3 machinery above. Input:
   * one row per (key, block) with a `_val` column; output: those rows
   * plus `outCol` = fold of all strictly earlier blocks' `_val`
   * (null when there are none).
   */
  private[operators] def exclusiveBlockPrefix(blocks: DataFrame, keyCols: Seq[String],
      blockCol: String, isMax: Boolean, desc: Boolean, outCol: String,
      persistInput: Boolean = true, keepVal: Boolean = false): DataFrame = {
    val grp = (keyCols :+ "_bkt").map(col)
    // The summary is referenced by three downstream branches (in-bucket
    // window, bucket totals, earlier-buckets broadcast); without a cache
    // each branch re-aggregates the full log. Persisting it is the
    // reference broker's ManagedLedger metadata table: one small row per
    // (key, ledger) — ~1e8 rows × tens of bytes even at 100 TB — and
    // Spark's CacheManager dedupes identical plans across repeated calls.
    // Callers whose `blocks` already reads a cache pass persistInput=false.
    val bucketed = blocks.withColumn("_bkt", floor(col(blockCol) / BucketWidth))
    val withBkt =
      if (persistInput) graft.CacheScope.track(bucketed)
      else bucketed
    val ord = if (desc) col(blockCol).desc else col(blockCol).asc
    val inW = Window.partitionBy(grp: _*).orderBy(ord)
      .rowsBetween(Window.unboundedPreceding, -1)
    def fold(c: Column) = if (isMax) max(c) else sum(c)
    val withIn = withBkt.withColumn("_pfx_in", fold(col("_val")).over(inW))
    val totals = withBkt.groupBy(grp: _*).agg(fold(col("_val")).as("_bval"))
    // Prefix over buckets of the same key: a window partitioned by the key
    // alone. Unpartitioned/single-task is fine HERE — its input is the
    // bucket-totals relation (~100 rows per key at 100 TB), the same tiny
    // set the former broadcast non-equi join shipped whole to every task.
    val ordBkt = if (desc) col("_bkt").desc else col("_bkt").asc
    val bw = Window.partitionBy(keyCols.map(col): _*).orderBy(ordBkt)
      .rowsBetween(Window.unboundedPreceding, -1)
    val bucketPrefix = totals
      .withColumn("_pfx_bkt", fold(col("_bval")).over(bw))
      .drop("_bval")
    val combined =
      if (isMax) greatest(
        coalesce(col("_pfx_in"), lit(Long.MinValue)),
        coalesce(col("_pfx_bkt"), lit(Long.MinValue)))
      else coalesce(col("_pfx_in"), lit(0L)) + coalesce(col("_pfx_bkt"), lit(0L))
    val asNull =
      if (isMax) when(combined === Long.MinValue, lit(null)).otherwise(combined)
      else combined
    val dropped = if (keepVal) Seq("_bkt", "_pfx_in", "_pfx_bkt")
      else Seq("_bkt", "_pfx_in", "_pfx_bkt", "_val")
    withIn.join(bucketPrefix, keyCols :+ "_bkt")
      .withColumn(outCol, asNull)
      .drop(dropped: _*)
  }

  /**
   * 0-based position of each row within its key group, ordered by
   * (blockCol, orderCol). Requires orderCol unique within a block
   * (MessageId order gives this for free). `keyCols` may be empty — the
   * dense GLOBAL sequence — or constant-valued; neither creates an
   * unpartitioned window.
   */
  def keyedSequence(env: DataFrame, keyCols: Seq[String], blockCol: String,
      orderCol: String, outCol: String): DataFrame = {
    val blocks = env.groupBy((keyCols :+ blockCol).map(col): _*)
      .agg(count(lit(1)).as("_val"))
    val offsets = exclusiveBlockPrefix(blocks, keyCols, blockCol,
      isMax = false, desc = false, "_blk_prefix")
    val withinW = Window.partitionBy((keyCols :+ blockCol).map(col): _*)
      .orderBy(col(orderCol))
    env.join(offsets, keyCols :+ blockCol)
      .withColumn(outCol, col("_blk_prefix") + row_number().over(withinW) - 1)
      .drop("_blk_prefix")
  }

  /** Dense 0-based GLOBAL position in (blockCol, orderCol) order — the
   * produce path's total order ([[keyedSequence]] with no keys). */
  def globalSequence(env: DataFrame, blockCol: String, orderCol: String,
      outCol: String): DataFrame =
    keyedSequence(env, Seq.empty, blockCol, orderCol, outCol)

  /**
   * Exclusive running max of `valueExpr` per key in (blockCol, orderCol)
   * order — the watermark shape: for each row, the max over all strictly
   * earlier rows of its key. Within-block exclusive max combined with the
   * bucketed prefix max of all earlier blocks.
   */
  def keyedRunningMaxExcl(env: DataFrame, keyCols: Seq[String], blockCol: String,
      orderCol: String, valueExpr: Column, outCol: String): DataFrame = {
    val valued = env.withColumn("_rowval", valueExpr)
    val blocks = valued.groupBy((keyCols :+ blockCol).map(col): _*)
      .agg(max(col("_rowval")).as("_val"))
    val offsets = exclusiveBlockPrefix(blocks, keyCols, blockCol,
      isMax = true, desc = false, "_blk_prefix_max")
    val withinW = Window.partitionBy((keyCols :+ blockCol).map(col): _*)
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    valued.join(offsets, keyCols :+ blockCol)
      .withColumn(outCol,
        greatest(coalesce(max(col("_rowval")).over(withinW), lit(Long.MinValue)),
          coalesce(col("_blk_prefix_max"), lit(Long.MinValue))))
      .withColumn(outCol, when(col(outCol) === Long.MinValue, lit(null)).otherwise(col(outCol)))
      .drop("_rowval", "_blk_prefix_max")
  }

  /**
   * Oldest-first EXCLUSIVE running sum of `valueExpr` per key in
   * (blockCol, orderCol) order — for each row, the total of all strictly
   * earlier rows of its key (0 for the first). The byte-quota shape:
   * which fixed-size bucket does this row's first byte fall in.
   */
  def keyedCumSumExcl(env: DataFrame, keyCols: Seq[String], blockCol: String,
      orderCol: String, valueExpr: Column, outCol: String): DataFrame = {
    val sized = env.withColumn("_rowval", valueExpr)
    val blocks = sized.groupBy((keyCols :+ blockCol).map(col): _*)
      .agg(sum(col("_rowval")).as("_val"))
    val offsets = exclusiveBlockPrefix(blocks, keyCols, blockCol,
      isMax = false, desc = false, "_blk_prefix")
    val withinW = Window.partitionBy((keyCols :+ blockCol).map(col): _*)
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    sized.join(offsets, keyCols :+ blockCol)
      .withColumn(outCol,
        col("_blk_prefix") + coalesce(sum(col("_rowval")).over(withinW), lit(0L)))
      .drop("_rowval", "_blk_prefix")
  }

  /**
   * Newest-first running sum of `valueExpr` per key (retention-style
   * cumulative size): within-block running sum + the bucketed prefix
   * total of all newer blocks.
   */
  def keyedCumSumDesc(env: DataFrame, keyCols: Seq[String], blockCol: String,
      orderCol: String, valueExpr: Column, outCol: String): DataFrame = {
    val sized = env.withColumn("_rowval", valueExpr)
    val blocks = sized.groupBy((keyCols :+ blockCol).map(col): _*)
      .agg(sum(col("_rowval")).as("_val"))
    val offsets = exclusiveBlockPrefix(blocks, keyCols, blockCol,
      isMax = false, desc = true, "_blk_prefix")
    val withinW = Window.partitionBy((keyCols :+ blockCol).map(col): _*)
      .orderBy(col(orderCol).desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    sized.join(offsets, keyCols :+ blockCol)
      .withColumn(outCol, col("_blk_prefix") + sum(col("_rowval")).over(withinW))
      .drop("_rowval", "_blk_prefix")
  }
}
