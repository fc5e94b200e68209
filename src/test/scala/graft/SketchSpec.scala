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

  test("HLL estimate lands near the exact distinct count on the corpus") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val grams = docs.select(col("source"),
      explode(graft.pipeline.TextOps.wordNGrams(col("text"), 3)).as("gram"))
    val est = Sketches.hllDistinct(grams, col("source"),
      Sketches.md5Hash60(col("gram"))).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("est_distinct")).toMap
    val exact = grams.groupBy("source").agg(countDistinct("gram").as("x"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet === exact.keySet && est.nonEmpty)
    exact.foreach { case (src, x) =>
      // m=64 registers → ~1.04/8 ≈ 13% relative standard error
      assert(math.abs(est(src) - x) / x < 0.5, s"$src: est=${est(src)} exact=$x")
    }
    // tiny-cardinality path: linear counting is near-exact
    val small = Seq("a b c d e f g h i j").toDF("text")
      .select(lit("s").as("source"),
        explode(graft.pipeline.TextOps.wordNGrams(col("text"), 3)).as("gram"))
    val smallEst = Sketches.hllDistinct(small, col("source"),
      Sketches.md5Hash60(col("gram"))).head().getAs[Double]("est_distinct")
    assert(math.abs(smallEst - 8.0) < 1.0) // 8 distinct 3-grams
  }

  test("CM sketch estimates are exact-or-over, never under") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val words = docs.select(explode(graft.pipeline.TextOps.words(
        coalesce(col("text"), lit("")))).as("word"))
      .filter(length(col("word")) > 0)
    val counters = Sketches.cmsCounters(words, col("word"), d = 4, w = 256)
    // fixed-size counter table, total mass conserved
    val rows = counters.collect()
    assert(rows.map(r => (r.getInt(0), r.getInt(1))).distinct.length == rows.length)
    assert(rows.forall(r => r.getInt(0) >= 0 && r.getInt(0) < 4 &&
      r.getInt(1) >= 0 && r.getInt(1) < 256))
    val total = words.count()
    assert(rows.filter(_.getInt(0) == 0).map(_.getLong(2)).sum === total)
    val est = Sketches.cmsEstimates(counters, words, col("word"), 4, 256)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = words.groupBy("word").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.keySet === est.keySet)
    exact.foreach { case (w, x) =>
      assert(est(w) >= x, s"CM under-counted $w: ${est(w)} < $x")
    }
  }

  test("Bloom filter: no false negatives, bounded false positives, mergeable") {
    import spark.implicits._
    val m = 4096; val k = 4
    val members = (1 to 300).map(i => ("g", s"member-$i"))
    val strangers = (1 to 1000).map(i => ("g", s"stranger-$i"))
    val bits = Sketches.bloomBits(members.toDF("g", "v"), col("g"), col("v"), m, k)
    // every member must probe positive — the defining invariant
    val memberHits = Sketches.bloomProbe(bits,
        members.toDF("g", "v"), col("g"), col("v"), m, k)
      .collect().map(_.getAs[Boolean]("bloom_positive"))
    assert(memberHits.length === 300 && memberHits.forall(identity))
    // strangers: fpr ≈ (1 - e^{-kn/m})^k ≈ 0.65% at n=300, m=4096, k=4;
    // 1000 probes should see well under 5%
    val fp = Sketches.bloomProbe(bits,
        strangers.toDF("g", "v"), col("g"), col("v"), m, k)
      .collect().count(_.getAs[Boolean]("bloom_positive"))
    assert(fp <= 50, s"false positives $fp / 1000")
    // merge = same groupBy-bit_or over the union of the two halves' bits
    val (l, r) = members.splitAt(150)
    val merged = Sketches
      .bloomBits(l.toDF("g", "v"), col("g"), col("v"), m, k)
      .union(Sketches.bloomBits(r.toDF("g", "v"), col("g"), col("v"), m, k))
      .groupBy(col("source"), col("widx"))
      .agg(expr("bit_or(bits)").as("bits"))
      .collect().map(x => (x.getString(0), x.getInt(1)) -> x.getLong(2)).toMap
    val whole = bits.collect()
      .map(x => (x.getString(0), x.getInt(1)) -> x.getLong(2)).toMap
    assert(merged === whole)
  }

  test("DDSketch estimates honor the relative-error guarantee vs exact quantiles") {
    import spark.implicits._
    val alpha = 0.02
    // log-uniform-ish positive values with duplicates and a long tail
    val rnd = new scala.util.Random(11)
    val values = Seq.fill(5000)(math.exp(rnd.nextDouble() * 9).toLong + 1)
    val df = values.map(("g", _)).toDF("g", "v")
    val buckets = Sketches.ddBuckets(df, col("g"), col("v"), alpha)
    val qs = Seq(0.01, 0.25, 0.5, 0.75, 0.9, 0.99)
    val est = Sketches.ddQuantiles(buckets, qs, alpha).collect()
      .map(r => r.getAs[Double]("q") -> r.getAs[Double]("est")).toMap
    val sorted = values.sorted
    qs.foreach { q =>
      // DDSketch answers the value at rank floor(q·(n−1)) within α
      val exact = sorted(math.floor(q * (values.size - 1)).toInt).toDouble
      val rel = math.abs(est(q) - exact) / exact
      assert(rel <= alpha + 1e-9, s"q=$q est=${est(q)} exact=$exact rel=$rel")
    }
    // sketch size is bucket-scale, not data-scale
    assert(buckets.count() < 600)
  }

  test("DDSketch merge is count addition over the bucket relation") {
    import spark.implicits._
    val alpha = 0.02
    val a = (1 to 700).map(i => ("g", (i * 7 % 500 + 1).toLong))
    val b = (1 to 900).map(i => ("g", (i * 13 % 800 + 1).toLong))
    val merged = Sketches.ddBuckets(a.toDF("g", "v"), col("g"), col("v"), alpha)
      .union(Sketches.ddBuckets(b.toDF("g", "v"), col("g"), col("v"), alpha))
      .groupBy(col("source"), col("bucket")).agg(sum(col("n")).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val whole = Sketches.ddBuckets((a ++ b).toDF("g", "v"), col("g"), col("v"), alpha)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged === whole && whole.nonEmpty)
    // non-positive and null values are excluded by contract
    val withBad = Seq(("g", Some(5L)), ("g", Some(0L)), ("g", Some(-3L)), ("g", None))
      .toDF("g", "v")
    val kept = Sketches.ddBuckets(withBad, col("g"), col("v"), alpha)
      .agg(sum(col("n"))).head().getLong(0)
    assert(kept === 1L)
  }

  test("KMV set ops: union/intersection estimates land near exact") {
    import spark.implicits._
    // two overlapping item sets: A = 0..2999, B = 2000..5999 →
    // |A|=3000 |B|=4000 |A∪B|=6000 |A∩B|=1000, Jaccard 1/6
    val items = ((0 until 3000).map(i => ("a", s"item-$i")) ++
      (2000 until 6000).map(i => ("b", s"item-$i"))).toDF("g", "it")
    val r = Sketches.kmvSetOps(items, col("g"), col("it"), k = 256, "a", "b")
      .head()
    val estA = r.getAs[Double]("est_a"); val estB = r.getAs[Double]("est_b")
    val estU = r.getAs[Double]("est_union")
    val jac = r.getAs[Double]("jaccard_est")
    val estI = r.getAs[Double]("est_intersection")
    // KMV standard error ~ 1/sqrt(k-1) ≈ 6.3%; assert a 4-sigma band
    assert(math.abs(estA - 3000) / 3000 < 0.25, s"est_a=$estA")
    assert(math.abs(estB - 4000) / 4000 < 0.25, s"est_b=$estB")
    assert(math.abs(estU - 6000) / 6000 < 0.25, s"est_union=$estU")
    assert(math.abs(jac - 1.0 / 6) < 0.08, s"jaccard=$jac")
    assert(math.abs(estI - 1000) / 1000 < 0.5, s"est_inter=$estI")
  }

  test("KMV set ops: below-k sets take the exact path") {
    import spark.implicits._
    val items = ((0 until 30).map(i => ("a", s"x-$i")) ++
      (20 until 50).map(i => ("b", s"x-$i"))).toDF("g", "it")
    val r = Sketches.kmvSetOps(items, col("g"), col("it"), k = 256, "a", "b")
      .head()
    // sketches hold every hash → the estimates are exact counts and the
    // match fraction is the true Jaccard
    assert(r.getAs[Double]("est_a") === 30.0)
    assert(r.getAs[Double]("est_b") === 30.0)
    assert(r.getAs[Double]("est_union") === 50.0)
    assert(r.getAs[Double]("jaccard_est") === 0.2)
    assert(r.getAs[Double]("est_intersection") === 10.0)
  }
}
