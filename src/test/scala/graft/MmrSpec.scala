package graft

import graft.pipeline.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** MMR diverse re-ranking (p111): a hand fixture where plain relevance
 * order and MMR order DIFFER — the second-most-relevant candidate is a
 * near-duplicate of the first pick, so the diversity penalty demotes it
 * below a less-relevant-but-novel candidate. Plus a driver-side greedy
 * replay over the engine's own pool for exactness. */
class MmrSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // 4-dim embeddings; query q=100 aligned with axis 0
  private val vecs = Seq(
    (100L, Array(1f, 0f, 0f, 0f)),      // query
    (1L, Array(1f, 0.1f, 0f, 0f)),      // most relevant
    (2L, Array(1f, 0.11f, 0f, 0f)),     // near-dup of 1, almost as relevant
    (3L, Array(0.7f, 0f, 0.7f, 0f)),    // less relevant but novel
    (4L, Array(0f, 1f, 0f, 0f))         // orthogonal
  ).toDF("vec_id", "embedding")

  test("near-duplicate runner-up is demoted below the novel candidate") {
    val got = Similarity.mmrSelect(
        vecs.filter(col("vec_id") === 100L), vecs.filter(col("vec_id") < 100L),
        poolN = 4, k = 3)
      .orderBy(col("rank"))
      .collect().map(r => (r.getAs[Int]("rank"), r.getAs[Long]("neighbor_id")))
    // relevance order is 1, 2, 3, 4 — but 2 ~ 1 (cos ≈ 1.0), so MMR
    // picks the novel 3 second; 2's penalty vs {1} (~1000) crushes its
    // margin while 4's orthogonality leaves it a positive score
    assert(got.map(_._2).head === 1L)
    assert(got(1)._2 === 3L, s"expected novel candidate second, got ${got.toSeq}")
    assert(got.map(_._1).toSeq === Seq(1, 2, 3))
  }

  test("length-mismatched embedding cannot be ranked: dropped, no crash") {
    val withBad = vecs.unionByName(
      Seq((5L, Array(1f, 0f))).toDF("vec_id", "embedding")) // 2-dim vs 4-dim
    val got = Similarity.mmrSelect(
        withBad.filter(col("vec_id") === 100L),
        withBad.filter(col("vec_id") < 100L), poolN = 8, k = 5)
      .collect().map(_.getAs[Long]("neighbor_id")).toSet
    // the 4 valid candidates all surface; the null-cosine one never does
    assert(got === Set(1L, 2L, 3L, 4L))
  }

  test("greedy replay: engine output equals a driver-side MMR") {
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      dot / (na * nb)
    }
    def e3(x: Double): Long = math.round(x * 1000)
    val all = vecs.collect().map(r =>
      r.getAs[Long]("vec_id") -> r.getAs[Seq[Float]]("embedding").toArray).toMap
    val q = all(100L)
    val cands = all.keys.filter(_ != 100L).toSeq
    val rel = cands.map(c => c -> e3(cos(q, all(c)))).toMap
    val pool = cands.sortBy(c => (-rel(c), c)).take(4)
    var selected = List.empty[Long]
    var remaining = pool.toSet
    val want = (1 to 3).map { rank =>
      val (s2, pick) = remaining.toSeq.map { c =>
        val pen = if (selected.isEmpty) 0L
          else selected.map(s => e3(cos(all(c), all(s)))).max
        (rel(c) - pen, c)
      }.minBy { case (s, c) => (-s, c) }
      remaining -= pick; selected ::= pick
      (rank, pick, s2)
    }
    val got = Similarity.mmrSelect(
        vecs.filter(col("vec_id") === 100L), vecs.filter(col("vec_id") < 100L),
        poolN = 4, k = 3)
      .orderBy(col("rank"))
      .collect().map(r => (r.getAs[Int]("rank"), r.getAs[Long]("neighbor_id"),
        r.getAs[Long]("score2x_e3"))).toSeq
    assert(got === want)
  }
}
