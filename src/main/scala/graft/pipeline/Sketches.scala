package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/**
 * Bounded k-minimum-values buffer over (group, hash) pairs: keeps the k
 * smallest DISTINCT hash values, sorted ascending. Like
 * [[TopKAggregator]], the buffer is bounded so partial (map-side)
 * aggregation ships at most k longs per group per partition — the
 * difference between shuffling k values and shuffling every distinct
 * element, which is what an exact distinct count pays.
 */
class KMinAggregator(k: Int)
    extends Aggregator[Long, Seq[Long], Seq[Long]] {
  require(k >= 1, s"KMV needs k >= 1, got $k")
  override def zero: Seq[Long] = Nil
  override def reduce(b: Seq[Long], a: Long): Seq[Long] =
    if (b.length >= k && a >= b.last) b
    else {
      val i = b.indexWhere(_ >= a)
      if (i >= 0 && b(i) == a) b // already present: KMV is a distinct sketch
      else {
        val ins = if (i < 0) b :+ a else (b.take(i) :+ a) ++ b.drop(i)
        if (ins.length > k) ins.take(k) else ins
      }
    }
  override def merge(x: Seq[Long], y: Seq[Long]): Seq[Long] =
    y.foldLeft(x)(reduce)
  override def finish(r: Seq[Long]): Seq[Long] = r
  override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}

/**
 * Distinct-cardinality sketches for corpus statistics — the "how many
 * distinct n-grams / urls / fingerprints per slice" questions that are
 * exact-count-prohibitive at 100 TB.
 *
 * KMV (k-minimum-values — Bar-Yossef et al. 2002): hash every element
 * uniformly into [0, 2³²); the k-th smallest distinct hash estimates the
 * cardinality as D ≈ (k−1)·2³² / kth. Unlike HLL the estimator is a pure
 * deterministic function of the hash set, so an engine-independent
 * oracle reproduces it EXACTLY — and the hash here is an md5 prefix,
 * computable in both engines.
 */
object Sketches {

  /** 32-bit uniform hash from the md5 prefix (exact in both engines). */
  def md5Hash32(v: Column): Column =
    conv(substring(md5(v.cast("binary")), 1, 8), 16, 10).cast("long")

  private val HashRange = 4294967296.0 // 2^32

  /**
   * Per-group KMV distinct estimate over `valueHash` (a 32-bit hash
   * column). The production shape: the only shuffle ships ≤ k longs per
   * (group, partition).
   */
  def kmvDistinct(df: DataFrame, group: Column, valueHash: Column,
      k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(group.cast("string").as("g"), valueHash.cast("long").as("h"))
      .as[(String, Long)]
      .groupByKey(_._1).mapValues(_._2)
      .agg(new KMinAggregator(k).toColumn.name("mins"))
      .toDF("source", "mins")
      .select(col("source"),
        size(col("mins")).as("n_kept"),
        element_at(col("mins"), -1).as("kth_min"))
      .withColumn("est_distinct",
        when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(round(
            lit((k - 1).toDouble * HashRange) / col("kth_min"), 2)))
  }

  /**
   * [[kmvDistinct]] plus the exact distinct count alongside — the
   * VERIFICATION-scale variant (the exact side pays the full
   * distinct-hash shuffle the sketch exists to avoid; production calls
   * [[kmvDistinct]]). The hashed relation is persisted so both branches
   * share one scan.
   */
  def kmvDistinctVerified(df: DataFrame, group: Column, valueHash: Column,
      k: Int): DataFrame = {
    val pairs = graft.CacheScope.track(
      df.select(group.cast("string").as("g"), valueHash.cast("long").as("h")))
    val exact = pairs.groupBy(col("g").as("source"))
      .agg(countDistinct(col("h")).as("exact_distinct"))
    kmvDistinct(pairs, col("g"), col("h"), k).join(exact, Seq("source"))
  }
}
