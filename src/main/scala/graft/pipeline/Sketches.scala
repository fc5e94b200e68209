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
    extends Aggregator[(String, Long), Seq[Long], Seq[Long]] {
  override def zero: Seq[Long] = Nil
  override def reduce(b: Seq[Long], in: (String, Long)): Seq[Long] = {
    val a = in._2
    if (b.length >= k && a >= b.last) b
    else {
      val i = b.indexWhere(_ >= a)
      if (i >= 0 && b(i) == a) b // already present: KMV is a distinct sketch
      else {
        val ins = if (i < 0) b :+ a else (b.take(i) :+ a) ++ b.drop(i)
        if (ins.length > k) ins.take(k) else ins
      }
    }
  }
  override def merge(x: Seq[Long], y: Seq[Long]): Seq[Long] =
    y.foldLeft(x)((b, a) => reduce(b, ("", a)))
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
   * column), with the exact distinct count alongside (verification-scale
   * luxury — the sketch exists so production does NOT pay it).
   */
  def kmvDistinct(df: DataFrame, group: Column, valueHash: Column,
      k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val pairs = df.select(group.cast("string").as("g"),
      valueHash.cast("long").as("h"))
    val mins = pairs.as[(String, Long)]
      .groupByKey(_._1)
      .agg(new KMinAggregator(k).toColumn.name("mins"))
      .toDF("source", "mins")
    val exact = pairs.groupBy(col("g").as("source"))
      .agg(countDistinct(col("h")).as("exact_distinct"))
    mins
      .select(col("source"),
        size(col("mins")).as("n_kept"),
        element_at(col("mins"), -1).as("kth_min"))
      .withColumn("est_distinct",
        when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(round(
            lit((k - 1).toDouble * HashRange) / col("kth_min"), 2)))
      .join(exact, Seq("source"))
  }
}
