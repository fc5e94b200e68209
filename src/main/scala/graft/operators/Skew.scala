package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew mitigation for hot keys.
 *
 * The log model concentrates traffic on few keys (hot topics, hot
 * producers). For algebraic aggregates Spark's map-side partial
 * aggregation already flattens skew; these helpers cover the two cases
 * it does not: (1) explicit two-phase aggregation when partial agg is
 * defeated (e.g. distinct-style or high-cardinality intermediate
 * states), and (2) salted broadcast-side replication for joining a
 * skewed fact side against a small dimension. AQE's skew-join handles
 * sort-merge cases at runtime; these are the declarative forms.
 */
object Skew {

  /** Two-phase salted aggregation: phase 1 aggregates (key, salt) —
   * spreading one hot key over `salts` reducers — phase 2 merges the
   * salted partials. `partialAggs` and `mergeAggs` must compose (e.g.
   * count→sum, sum→sum, max→max). */
  def saltedAggregate(df: DataFrame, keyCols: Seq[String], salts: Int,
      partialAggs: Seq[Column], mergeAggs: Seq[Column]): DataFrame = {
    val salted = df.withColumn("_salt", pmod(spark_partition_id(), lit(salts)))
    salted.groupBy((keyCols :+ "_salt").map(col): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
      .groupBy(keyCols.map(col): _*)
      .agg(mergeAggs.head, mergeAggs.tail: _*)
  }

  /** Salted join of a skewed fact side against a small dimension: the
   * dimension replicates `salts`× (it is small by assumption), the fact
   * side salts randomly-but-deterministically by partition, so one hot
   * join key spreads over `salts` tasks. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, joinKey: String,
      salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("_salt", pmod(spark_partition_id(), lit(salts)))
    val replicatedDim = dim.crossJoin(
      spark_range(dim.sparkSession, salts).withColumnRenamed("id", "_salt"))
    saltedFact.join(replicatedDim,
      saltedFact(joinKey) === replicatedDim(joinKey) &&
        saltedFact("_salt") === replicatedDim("_salt"))
      .drop(replicatedDim(joinKey)).drop("_salt")
  }

  private def spark_range(spark: org.apache.spark.sql.SparkSession, n: Int): DataFrame =
    spark.range(n).toDF()
}
