package graft

import graft.pipeline.GraphOps
import org.scalatest.funsuite.AnyFunSuite

/** Fixed-point integer PageRank vs a naive driver-side replay: the
 * distributed superstep joins must reproduce the exact integer fixed
 * point (floor-div contributions, 15/85 split) on hand and random
 * graphs, including the symmetry and hub-dominance sanity properties. */
class GraphOpsSpec extends AnyFunSuite {
  import TestSpark._

  /** Naive replay of GraphOps.pageRank's integer arithmetic. */
  private def naive(edges: Seq[(Long, Long)], iters: Int,
      scale: Long = 1000000000000L): Map[Long, Long] = {
    val dir = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val deg = dir.groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
    val n = deg.size.toLong
    var r: Map[Long, Long] = deg.map { case (node, _) => node -> scale / n }
    (1 to iters).foreach { _ =>
      val inflow = dir.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => r(src) / deg(src) }.sum
      }
      r = deg.map { case (node, _) =>
        node -> (15L * (scale / n) / 100L +
          85L * inflow.getOrElse(node, 0L) / 100L)
      }
    }
    r
  }

  test("path graph: exact integer fixed point, endpoint symmetry") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L))
    val got = GraphOps.pageRank(edges.toDF("a", "b"), "a", "b",
        iterations = 3)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("deg"), r.getAs[Long]("rank_e12"))).toMap
    val exp = naive(edges, 3)
    assert(got.view.mapValues(_._2).toMap === exp)
    assert(got(1L) === got(3L), "path endpoints must tie exactly")
    assert(got(2L)._2 > got(1L)._2, "the middle node is more central")
    assert(got(1L)._1 === 1L && got(2L)._1 === 2L)
  }

  test("seeded random graph matches the naive replay bit for bit — both paths") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val edges = (0 until 60).map { _ =>
      val a = rnd.nextInt(25).toLong
      var b = rnd.nextInt(25).toLong
      while (b == a) b = rnd.nextInt(25).toLong
      (math.min(a, b), math.max(a, b))
    }.distinct
    val exp = naive(edges, 3)
    // measured-size fast path (single-task)
    val local = GraphOps.pageRank(edges.toDF("a", "b"), "a", "b",
        iterations = 3)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Long]("rank_e12")).toMap
    assert(local === exp)
    // distributed superstep path, forced by a zero threshold — must be
    // bit-identical to the local loop
    val dist = GraphOps.pageRank(edges.toDF("a", "b"), "a", "b",
        iterations = 3, localMaxEdges = 0L)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Long]("rank_e12")).toMap
    assert(dist === exp)
  }

  test("triangleStats: closed triangle + pendant + isolate, exact ppm") {
    import spark.implicits._
    // 1-2-3 closed, 4 pendant off 3, 5 isolated
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("a", "b")
    val nodes = Seq(1L, 2L, 3L, 4L, 5L).toDF("vec_id")
    val got = GraphOps.triangleStats(nodes, "vec_id", edges, "a", "b")
      .collect().map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("deg"), r.getAs[Long]("tri"),
          r.getAs[Long]("lcc_ppm"))).toMap
    assert(got(1L) === ((2L, 1L, 1000000L)))
    assert(got(2L) === ((2L, 1L, 1000000L)))
    assert(got(3L) === ((3L, 1L, 333333L))) // 2·1·10⁶ div (3·2)
    assert(got(4L) === ((1L, 0L, 0L)))
    assert(got(5L) === ((0L, 0L, 0L)))
  }

  test("triangleStats vs brute force on a seeded random graph") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val edges = (0 until 80).map { _ =>
      val a = rnd.nextInt(18).toLong
      var b = rnd.nextInt(18).toLong
      while (b == a) b = rnd.nextInt(18).toLong
      (math.min(a, b), math.max(a, b))
    }.distinct
    val eset = edges.toSet
    val nodes = (0L until 18L)
    val triOf = nodes.map { v =>
      val nbrs = nodes.filter(u =>
        eset(math.min(u, v) -> math.max(u, v))).toSeq
      v -> (for {
        i <- nbrs.indices; j <- (i + 1) until nbrs.size
        if eset(math.min(nbrs(i), nbrs(j)) -> math.max(nbrs(i), nbrs(j)))
      } yield 1).size.toLong
    }.toMap
    val got = GraphOps.triangleStats(nodes.toDF("vec_id"), "vec_id",
        edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Long]("tri")).toMap
    assert(got === triOf)
  }
}
