package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * P123 — graph-based ANN: a deterministic hierarchical small-world
 * index (Malkov & Yashunin 2016's HNSW recipe, made batch-buildable)
 * with a greedy beam search and a recall@k audit — the index family
 * production vector search defaults to, completing the IVF (p14/p92) /
 * PQ-ADC (p93) / SQ8 (p119/p122) surface.
 *
 * Determinism replaces HNSW's randomness everywhere so any engine
 * rebuilds the identical graph:
 *  - the level draw is the md5-u32 geometric rule u32 < 2³²/4^l
 *    (P(level ≥ l) = 4⁻ˡ, the paper's mL = 1/ln 4) instead of
 *    floor(−ln(U)·mL);
 *  - neighbor lists are the M nearest CELL MATES (the p61 IVF-cell
 *    candidate bound — never an all-pairs join) by EXACT INTEGER
 *    distance: each component e3-quantized once via floor(v·10³+0.5)
 *    in DOUBLE (pure IEEE, engine-portable), then the integer Σd² —
 *    no float comparison anywhere in the ranking;
 *  - links are symmetrized (undirected union, per-node degree ≤ 2M),
 *    the paper's bidirectional connect without the heuristic prune;
 *  - insertion order disappears: the whole level-l graph is one
 *    cell-keyed pair join + top-M window over nodes with level ≥ l.
 *
 * Search is the paper's two-phase walk with FIXED superstep counts so
 * the oracle can unroll it as literal SQL (the p83 convention): start
 * at the global max-level node (ties to the smallest id), one greedy
 * hop per upper level (current ∪ its level-l neighbors, keep the
 * closest), then `beamSteps` beam expansions over the level-0 graph
 * keeping the ef closest visited nodes, and finally top-k from the
 * beam. The audit reports per-query recall against the exact top-k
 * under the SAME integer metric (the p122 pattern; self excluded on
 * both sides).
 *
 * Shape at 100 TB: level assignment is a projection; each level graph
 * is the p61 cell-bounded pair join (~N^1.5 with √N cells, map-side
 * broadcast assignment); the search state is |queries|·ef rows joining
 * a broadcast candidate set against the corpus by vec_id per superstep.
 * The exact side is the brute-force audit class (p92/p122) — bounded by
 * |queries| and present to MEASURE the graph, not to serve traffic.
 */
object Hnsw {

  /** Exact integer squared L2 between two float vectors, each component
   * e3-quantized via floor(v·10³ + 0.5) in DOUBLE. For 64-dim unit-ish
   * embeddings the sum is ≤ ~10⁸ — far inside LONG. */
  def q3Dist(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) =>
        floor(x.cast("double") * 1000 + 0.5).cast("long") -
          floor(y.cast("double") * 1000 + 0.5).cast("long")),
      lit(0L), (acc, d) => acc + d * d)

  /** md5-u32 geometric level draw: level = |{l ∈ 1..maxLevel :
   * u32 < 2³²/4ˡ}|. */
  def withLevel(vecs: DataFrame, maxLevel: Int): DataFrame = {
    val u32 = expr("CAST(conv(substring(md5(CAST(vec_id AS STRING)), 1, 8)" +
      ", 16, 10) AS BIGINT)")
    vecs.withColumn("level",
      (1 to maxLevel).map(l =>
        when(u32 < lit(4294967296L / (1L << (2 * l))), 1).otherwise(0))
        .reduce(_ + _))
  }

  /** The cell-adjacency relation: every cell plus its `adj` nearest
   * OTHER cells by integer centroid distance — the candidate bound that
   * keeps the graph CONNECTED across cells (a purely cell-local graph
   * is a disjoint union of per-cell components, and the first build of
   * this index measured recall 0.07 exactly because the walk could
   * never leave the entry's cell). Centroid-scale: |C|·(adj+1) rows. */
  def cellAdjacency(centroids: DataFrame, adj: Int): DataFrame = {
    val w = Window.partitionBy(col("cell")).orderBy(col("cdist"),
      col("cand_cell"))
    val near = centroids.as("x").join(centroids.as("y"),
        col("x.centroid_id") =!= col("y.centroid_id"))
      .select(col("x.centroid_id").as("cell"),
        col("y.centroid_id").as("cand_cell"),
        q3Dist(col("x.cembedding"), col("y.cembedding")).as("cdist"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= adj)
      .select(col("cell"), col("cand_cell"))
    near.unionByName(centroids.select(col("centroid_id").as("cell"),
      col("centroid_id").as("cand_cell")))
  }

  /** The undirected level-l neighbor lists: top-M nodes with level ≥ l
   * from the node's cell OR an adjacent cell, by (integer distance,
   * id), symmetrized (degree ≤ 2M). */
  def levelEdges(assigned: DataFrame, cellAdj: DataFrame, l: Int,
      m: Int): DataFrame = {
    val nodes = assigned.filter(col("level") >= l)
      .select(col("vec_id"), col("cluster"), col("embedding"))
    val w = Window.partitionBy(col("src")).orderBy(col("dist"), col("dst"))
    val top = nodes.as("a")
      .join(broadcast(cellAdj), col("a.cluster") === col("cell"))
      .join(nodes.as("b"),
        col("cand_cell") === col("b.cluster") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("src"), col("b.vec_id").as("dst"),
        q3Dist(col("a.embedding"), col("b.embedding")).as("dist"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= m)
      .select(col("src"), col("dst"))
    top.unionByName(top.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
  }

  /**
   * Build + search + audit in one relation: per query (vec_id <
   * queryMax), the hit count and recall@k of the beam-searched top-k
   * against the exact integer-metric top-k.
   */
  def recallAudit(vecs: DataFrame, centroids: DataFrame, queryMax: Long,
      m: Int, ef: Int, k: Int, maxLevel: Int, beamSteps: Int,
      cellAdj: Int = 2, hopsPerLevel: Int = 2): DataFrame = {
    require(m > 0 && ef >= k && k > 0 && maxLevel >= 1 && beamSteps >= 1)
    val assigned = graft.CacheScope.track(
      withLevel(Similarity.ivfAssign(vecs, centroids), maxLevel))
    val adj = cellAdjacency(centroids, cellAdj)
    val emb = assigned.select(col("vec_id").as("node_id"),
      col("embedding").as("node_emb"))
    val edges = (0 to maxLevel).map(l =>
      l -> graft.CacheScope.track(levelEdges(assigned, adj, l, m))).toMap

    val queries = broadcast(vecs.filter(col("vec_id") < queryMax)
      .select(col("vec_id").as("qid"), col("embedding").as("qemb")))
    // entry: the global max-level node, ties to the smallest id
    val entry = broadcast(assigned
      .orderBy(col("level").desc, col("vec_id")).limit(1)
      .select(col("vec_id").as("node")))

    def scored(cand: DataFrame): DataFrame =
      cand.distinct()
        .join(emb, col("node") === col("node_id"))
        .join(queries, Seq("qid"))
        .select(col("qid"), col("node"),
          q3Dist(col("qemb"), col("node_emb")).as("dist"))

    // upper levels: fixed greedy hops — keep the closest of the current
    // node and its level-l neighbors
    var cur: DataFrame = queries.select(col("qid")).crossJoin(entry)
    for (l <- maxLevel to 1 by -1; _ <- 1 to hopsPerLevel) {
      val expanded = cur.unionByName(
        cur.join(edges(l), col("node") === col("src"))
          .select(col("qid"), col("dst").as("node")))
      val w1 = Window.partitionBy(col("qid"))
        .orderBy(col("dist"), col("node"))
      cur = scored(expanded)
        .withColumn("rn", row_number().over(w1)).filter(col("rn") === 1)
        .select(col("qid"), col("node"))
    }
    // level-0 beam: expand neighbors, keep the ef closest visited
    var beam = cur
    val wEf = Window.partitionBy(col("qid")).orderBy(col("dist"), col("node"))
    for (_ <- 1 to beamSteps) {
      val expanded = beam.unionByName(
        beam.join(edges(0), col("node") === col("src"))
          .select(col("qid"), col("dst").as("node")))
      beam = scored(expanded)
        .withColumn("rn", row_number().over(wEf)).filter(col("rn") <= ef)
        .select(col("qid"), col("node"))
    }
    val approx = scored(beam).filter(col("node") =!= col("qid"))
      .withColumn("rn", row_number().over(wEf)).filter(col("rn") <= k)
      .select(col("qid").as("query_id"), col("node").as("neighbor_id"))

    val exact = vecs.crossJoin(queries)
      .filter(col("qid") =!= col("vec_id"))
      .withColumn("dist", q3Dist(col("qemb"), col("embedding")))
      .withColumn("rn", row_number().over(Window.partitionBy(col("qid"))
        .orderBy(col("dist"), col("vec_id"))))
      .filter(col("rn") <= k)
      .select(col("qid").as("query_id"), col("vec_id").as("neighbor_id"))

    queries.select(col("qid").as("query_id"))
      .join(exact.join(approx, Seq("query_id", "neighbor_id"))
        .groupBy(col("query_id")).agg(count(lit(1)).as("n_hits")),
        Seq("query_id"), "left")
      .withColumn("n_hits", coalesce(col("n_hits"), lit(0L)))
      .withColumn("recall_ppm", expr(s"(n_hits * 1000000) div $k"))
  }
}
