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
      iterations: Int, scale: Long = 1000000000000L, dampPct: Int = 85)
      : DataFrame = {
    require(iterations >= 1 && dampPct >= 0 && dampPct <= 100)
    val dir = graft.CacheScope.track(
      edges.select(col(aCol).as("src"), col(bCol).as("dst"))
        .union(edges.select(col(bCol).as("src"), col(aCol).as("dst"))))
    val deg = graft.CacheScope.track(
      dir.groupBy(col("src")).agg(count(lit(1)).as("deg")))
    val nRow = deg.agg(count(lit(1)).as("n"))
    var r = deg.crossJoin(broadcast(nRow))
      .select(col("src").as("node"), expr(s"$scale div n").as("rk"))
    for (_ <- 1 to iterations) {
      val inflow = dir
        .join(r.withColumnRenamed("node", "src"), Seq("src"))
        .join(deg, Seq("src"))
        .select(col("dst"), expr("rk div deg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      r = deg.select(col("src").as("node"))
        .join(inflow.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .crossJoin(broadcast(nRow))
        .select(col("node"),
          expr(s"((${100 - dampPct}) * ($scale div n)) div 100" +
            s" + ($dampPct * coalesce(s, 0)) div 100").as("rk"))
    }
    r.join(deg, col("node") === col("src"))
      .select(col("node").as("vec_id"), col("deg"),
        col("rk").as("rank_e12"))
  }
}
