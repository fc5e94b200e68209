package graft

import graft.pipeline.{KMinAggregator, Sketches}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** KMV sketch: the bounded aggregator must keep exactly the k smallest
 * distinct values regardless of arrival order or partitioning, and the
 * estimator must be accurate on the corpus fixture. */
class SketchSpec extends AnyFunSuite {
  import TestSpark._

  test("k-min buffer keeps the k smallest distinct values in any order") {
    val rnd = new scala.util.Random(5)
    val agg = new KMinAggregator(8)
    for (_ <- 1 to 50) {
      val values = Seq.fill(100)(rnd.nextInt(40).toLong) // heavy duplicates
      val buf = values.foldLeft(agg.zero)((b, v) => agg.reduce(b, v))
      val expected = values.distinct.sorted.take(8)
      assert(buf === expected)
      // merge of a random split reproduces the same buffer
      val (l, r) = values.splitAt(rnd.nextInt(values.size))
      val bl = l.foldLeft(agg.zero)((b, v) => agg.reduce(b, v))
      val br = r.foldLeft(agg.zero)((b, v) => agg.reduce(b, v))
      assert(agg.merge(bl, br) === expected)
    }
  }

  test("KMV estimate lands near the exact distinct count on the corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val grams = docs.select(col("source"),
      explode(graft.pipeline.TextOps.wordNGrams(col("text"), 3)).as("gram"))
    val out = Sketches.kmvDistinctVerified(grams, col("source"),
      Sketches.md5Hash32(col("gram")), 32).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val est = r.getAs[Double]("est_distinct")
      val exact = r.getAs[Long]("exact_distinct").toDouble
      // KMV with k=32 has ~1/sqrt(30) ≈ 18% relative standard error
      assert(math.abs(est - exact) / exact < 0.6,
        s"${r.getString(0)}: est=$est exact=$exact")
    }
    // aggregate accuracy is much tighter than per-group
    val totalEst = out.map(_.getAs[Double]("est_distinct")).sum
    val totalExact = out.map(_.getAs[Long]("exact_distinct")).sum.toDouble
    assert(math.abs(totalEst - totalExact) / totalExact < 0.2)
  }
}
