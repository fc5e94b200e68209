package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Hnsw

/** P123 — the deterministic HNSW-recipe graph ANN. Pins the recall
 * floor at the production parameters (the audit's whole point: the
 * project's ANN standard is ≥ 0.9; p122's SQ8 sets 0.98), the
 * md5-geometric level draw against an independent JDK MessageDigest
 * replay, and the structural graph invariants (symmetry, mean degree
 * ≤ 2M, level discipline) the oracle's rebuild relies on. */
class HnswSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val vecs =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  private lazy val centroids = vecs.filter(col("vec_id") % 50 === 0)
    .select(col("vec_id").as("centroid_id"),
      col("embedding").as("cembedding"))

  test("recall@5 at the p123 production parameters is >= 0.9") {
    val audit = Hnsw.recallAudit(vecs, centroids, queryMax = 20L,
      m = 16, ef = 128, k = 5, maxLevel = 2, beamSteps = 4,
      cellAdj = 8, hopsPerLevel = 1)
    val mean = audit.agg(avg(col("recall_ppm"))).collect()(0).getDouble(0)
    assert(mean >= 900000d, s"mean recall_ppm $mean < 900000")
    CacheScope.releaseAll()
  }

  test("level draw matches an independent md5 replay") {
    import spark.implicits._
    val ids = (0L until 512L).toDF("vec_id")
    val got = Hnsw.withLevel(ids, maxLevel = 3)
      .select(col("vec_id"), col("level")).as[(Long, Int)]
      .collect().toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    for (id <- 0L until 512L) {
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .take(4).map(b => f"$b%02x").mkString
      val u32 = java.lang.Long.parseLong(hex, 16)
      val want = (1 to 3).count(l => u32 < 4294967296L / (1L << (2 * l)))
      assert(got(id) === want, s"vec_id $id: got ${got(id)}, want $want")
    }
  }

  test("level graphs are self-loop-free, hard degree-capped at 2M, " +
    "level-disciplined") {
    val qcents = centroids.select(col("centroid_id"),
      Hnsw.q3Codes(col("cembedding")).as("ccodes"))
    val coded = vecs.select(col("vec_id"),
      Hnsw.q3Codes(col("embedding")).as("codes"))
    val assigned = Hnsw.withLevel(Hnsw.assignCells(coded, qcents), 2)
      .cache()
    val m = 4
    for (l <- 0 to 2) {
      val adj = Hnsw.cellAdjacency(qcents, 2 << (2 * l))
      val e = Hnsw.levelEdges(assigned, adj, l, m).cache()
      assert(e.filter(col("src") === col("dst")).count() === 0L)
      // the Mmax cap is a HARD per-node bound (the pre-cap union is
      // symmetric; the cap may drop one direction of a hub edge)
      val maxDeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .agg(max(col("deg"))).collect()(0).getLong(0)
      assert(maxDeg <= 2L * m, s"level $l degree $maxDeg > ${2 * m}")
      // every capped edge existed in the symmetric union: its reverse
      // OR itself must appear among some node's own top-m picks — here
      // checked structurally: both endpoints carry level >= l
      val lv = assigned.select(col("vec_id"), col("level"))
      val bad = e.join(lv, e("src") === lv("vec_id"))
        .filter(col("level") < l).count()
      assert(bad === 0L, s"level $l has $bad under-leveled endpoints")
      val bad2 = e.join(lv, e("dst") === lv("vec_id"))
        .filter(col("level") < l).count()
      assert(bad2 === 0L, s"level $l has $bad2 under-leveled dst endpoints")
      e.unpersist()
    }
    // the all-levels union build (levelEdgesAllD, the audits' r21 path)
    // must slice row-for-row to the per-level builds above
    val all = Hnsw.levelEdgesAllD(assigned, qcents, maxLevel = 2, m = m,
      cellAdj = 2).cache()
    for (l <- 0 to 2) {
      val adj = Hnsw.cellAdjacency(qcents, 2 << (2 * l))
      val per = Hnsw.levelEdgesD(assigned, adj, l, m)
        .select(col("src"), col("dst"), col("dist"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      val slice = all.filter(col("level") === l)
        .select(col("src"), col("dst"), col("dist"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      assert(slice === per, s"level $l union slice != per-level build")
    }
    all.unpersist()
    assigned.unpersist()
  }

  test("cell assignment picks the integer-nearest centroid") {
    import spark.implicits._
    val qcents = centroids.select(col("centroid_id"),
      Hnsw.q3Codes(col("cembedding")).as("ccodes"))
    val coded = vecs.select(col("vec_id"),
      Hnsw.q3Codes(col("embedding")).as("codes"))
    val got = Hnsw.assignCells(coded, qcents)
      .select(col("vec_id"), col("cluster")).as[(Long, Long)]
      .collect().toMap
    // independent replay on the driver for a sample of vectors
    val cents = qcents.as[(Long, Array[Long])].collect()
    val sample = coded.filter(col("vec_id") % 37 === 0)
      .as[(Long, Array[Long])].collect()
    for ((id, c) <- sample) {
      val want = cents.map { case (cid, cc) =>
        val d = c.zip(cc).map { case (x, y) => (x - y) * (x - y) }.sum
        (d, cid)
      }.min._2
      assert(got(id) === want, s"vec_id $id assigned ${got(id)}, want $want")
    }
  }
}
