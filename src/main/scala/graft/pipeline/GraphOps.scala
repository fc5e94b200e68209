package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Iterative graph analytics over edge lists the pipeline already derives
 * (mutual-kNN similarity graphs, duplicate-cluster edges) — the ranking
 * companion to the connected-components machinery in [[DedupOps]].
 */
object GraphOps {

  /**
   * PageRank (Brin & Page 1998) over an UNDIRECTED edge list, in exact
   * fixed-point integer arithmetic: ranks are integers at ×`scale`, the
   * per-edge contribution is `rank div degree` (floor), and each
   * iteration is r' = (100−damp)%·(scale div N) + damp%·Σ inflow, all in
   * integer division — so every intermediate is engine-independent and
   * an independent SQL engine replays the fixed point bit for bit. The
   * floor divisions shed O(degree) mass per node per iteration — at
   * scale 10¹² that skews a rank by parts-per-billion, irrelevant for
   * ordering, and determinism is what a curation pipeline needs (the
   * centrality ORDER decides which duplicate representative or seed doc
   * to keep; used with similarity graphs this is the PageRank-centrality
   * variant of SemDeDup-style representative selection).
   *
   * Nodes are the edge endpoints; isolated vectors simply don't appear
   * (callers union them back with the uniform base rank if needed).
   *
   * Shape at 100 TB: each iteration is one co-partitioned join of the
   * rank relation against the directed edge list on the source key plus
   * one hash agg on the destination key with map-side partials —
   * edge-linear supersteps, the p18 min-label shape; nothing ever
   * collects to the driver and the iteration count is a constant.
   */
  def pageRank(edges: DataFrame, aCol: String, bCol: String,
      iterations: Int, scale: Long = 1000000000000L, dampPct: Int = 85,
      localMaxEdges: Long = 10_000_000L): DataFrame = {
    require(iterations >= 1 && dampPct >= 0 && dampPct <= 100)
    val parts = edges.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "32").toInt
    val dir0 = graft.CacheScope.track(
      edges.select(col(aCol).cast("long").as("src"),
          col(bCol).cast("long").as("dst"))
        .union(edges.select(col(bCol).cast("long").as("src"),
          col(aCol).cast("long").as("dst"))))
    // measured-size fast path (the dupLabels convention): a graph whose
    // edge list fits one executor runs the whole fixed-point loop as ONE
    // narrow task — a constant-iteration superstep chain on a tiny graph
    // is pure scheduler overhead otherwise. Same integer arithmetic,
    // bit-identical output (GraphOpsSpec pins both paths to the naive
    // replay).
    if (dir0.count() <= 2 * localMaxEdges)
      return localPageRank(dir0, iterations, scale, dampPct)
    val dir = dir0
    val deg0 = dir.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // ALL loop-invariant state is built once, co-partitioned on the
    // source key, and persisted: the degree+count dimension and the
    // degree-annotated directed edge list. Every superstep then needs
    // exactly ONE exchange (the inflow aggregation onto the destination
    // key) — the rank relation it joins arrives already partitioned on
    // the source key from the previous superstep's aggregate, and the
    // join against the pre-partitioned edge list is exchange-free.
    val deg = graft.CacheScope.track(
      deg0.crossJoin(broadcast(deg0.agg(count(lit(1)).as("n"))))
        .repartition(parts, col("src")))
    val dirDeg = graft.CacheScope.track(
      dir.join(deg.select(col("src"), col("deg"), col("n")), Seq("src"))
        .repartition(parts, col("src")))
    var r = deg.select(col("src").as("node"), expr(s"$scale div n").as("rk"))
    for (_ <- 1 to iterations) {
      // every node of an undirected edge list has ≥1 neighbor, so the
      // inflow aggregate covers ALL nodes — no outer join needed
      r = graft.CacheScope.track(
        dirDeg.join(r.withColumnRenamed("node", "src"), Seq("src"))
          .select(col("dst"), col("n"), expr("rk div deg").as("c"))
          .groupBy(col("dst"))
          .agg(max(col("n")).as("n"), sum(col("c")).as("s"))
          .select(col("dst").as("node"),
            expr(s"((${100 - dampPct}) * ($scale div n)) div 100" +
              s" + ($dampPct * s) div 100").as("rk")))
    }
    r.join(deg, col("node") === col("src"))
      .select(col("node").as("vec_id"), col("deg"),
        col("rk").as("rank_e12"))
  }

  /** Single-task fixed-point PageRank over a symmetric edge list that
   * fits in one executor: the identical integer arithmetic as the
   * superstep path (floor-div contributions, (100−damp)/damp split),
   * one narrow repartition(1), zero shuffles after it. */
  private def localPageRank(sym: DataFrame, iterations: Int, scale: Long,
      dampPct: Int): DataFrame = {
    val spark = sym.sparkSession
    import spark.implicits._
    sym.as[(Long, Long)].repartition(1).mapPartitions { it =>
      val adj = scala.collection.mutable.Map
        .empty[Long, scala.collection.mutable.ArrayBuffer[Long]]
      it.foreach { case (src, dst) =>
        adj.getOrElseUpdate(src,
          scala.collection.mutable.ArrayBuffer.empty[Long]) += dst
      }
      val n = adj.size.toLong
      var r: Map[Long, Long] =
        adj.keysIterator.map(_ -> scale / n).toMap
      (1 to iterations).foreach { _ =>
        val inflow = scala.collection.mutable.Map.empty[Long, Long]
          .withDefaultValue(0L)
        adj.foreach { case (src, dsts) =>
          val c = r(src) / dsts.size
          dsts.foreach(d => inflow(d) += c)
        }
        r = adj.keysIterator.map { node =>
          node -> ((100L - dampPct) * (scale / n) / 100L +
            dampPct * inflow(node) / 100L)
        }.toMap
      }
      adj.iterator.map { case (node, dsts) =>
        (node, dsts.size.toLong, r(node))
      }
    }.toDF("vec_id", "deg", "rank_e12")
  }

  /**
   * Per-node triangle count and local clustering coefficient over an
   * UNDIRECTED a<b edge list — the density diagnostic that separates a
   * tight duplicate clique from a hub-and-spoke similarity artifact in
   * the mutual-kNN graph (a near-dup cluster closes its triangles; a
   * template-spam hub does not). Each triangle is enumerated exactly
   * once in a<b<c orientation: wedge join on the shared middle vertex,
   * closed by a join back to the edge list. The coefficient is integer
   * ppm (2·tri·10⁶ div deg·(deg−1)), zero for degree < 2 — no float
   * division anywhere.
   *
   * Shape at 100 TB: the wedge join is the standard edge-edge join on
   * one vertex key — Σ deg² work, which a k-bounded kNN graph caps at
   * k²·|V| — and the closure check is a second edge-keyed join; both
   * co-partition on edge endpoints, with nothing driver-side. (For
   * skewed general graphs the classic refinement — orient wedges
   * low-degree → high-degree — drops into the same plan as a degree
   * join + filter; the kNN graphs this serves are degree-capped by
   * construction, so the simple orientation suffices.)
   */
  def triangleStats(nodes: DataFrame, nodeCol: String,
      edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val e = edges.select(col(aCol).cast("long").as("a"),
      col(bCol).cast("long").as("b"))
    val deg = e.select(col("a").as("node"))
      .union(e.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    // wedges a<b<c through middle vertex b, closed by (a, c) ∈ e
    val tri = e.as("e1")
      .join(e.as("e2"), col("e1.b") === col("e2.a"))
      .join(e.as("e3"),
        col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"),
        "left_semi")
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
    val perNode = tri.select(col("x").as("node"))
      .union(tri.select(col("y").as("node")))
      .union(tri.select(col("z").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("tri"))
    nodes.select(col(nodeCol).cast("long").as("node"))
      .join(deg, Seq("node"), "left")
      .join(perNode, Seq("node"), "left")
      .select(col("node").as(nodeCol),
        coalesce(col("deg"), lit(0L)).as("deg"),
        coalesce(col("tri"), lit(0L)).as("tri"))
      .withColumn("lcc_ppm",
        when(col("deg") >= 2,
          expr("(2 * tri * 1000000) div (deg * (deg - 1))"))
          .otherwise(0L))
  }
}
