package graft

import graft.pipeline.Retrieval
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BM25 top-k retrieval vs a naive driver-side scorer: the engine's
 * distributed tf/df/dl derivation and the windowed top-k must reproduce
 * the textbook formula applied doc-by-doc, including the ×10⁴
 * contribution rounding, self-exclusion, and id tie-breaks. */
class RetrievalSpec extends AnyFunSuite {
  import TestSpark._

  /** Naive BM25 over in-memory docs — the same exact-integer arithmetic
   * the engine and the DuckDB oracle share (k1=1.2, b=0.75, Lucene
   * shifted idf as idf_e6; (2·num+den)/(2·den) round-half-up). */
  private def naive(corpus: Seq[(Long, String)], queryIds: Set[Long],
      k: Int): Seq[(Long, Int, Long, Long)] = {
    def words(t: String): Seq[String] =
      t.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim
        .split(" ").toSeq.filter(_.nonEmpty)
    val toks = corpus.map { case (id, t) => id -> words(t) }.toMap
    val n = corpus.size.toLong
    val totalLen = toks.values.map(_.size.toLong).sum
    val df = toks.values.flatMap(_.distinct).groupBy(identity)
      .map { case (w, occ) => w -> occ.size.toLong }
    def idfE6(dfw: Long): Long =
      math.floor(math.log((2 * n + 2).toDouble / (2 * dfw + 1).toDouble)
        * 1000000.0 + 0.5).toLong
    queryIds.toSeq.sorted.flatMap { qid =>
      val qws = toks(qid).distinct
      val scored = corpus.collect { case (did, _)
          if did != qid && toks(did).exists(qws.contains) =>
        val dl = toks(did).size.toLong
        val score = qws.collect {
          case w if toks(did).contains(w) =>
            val tf = toks(did).count(_ == w).toLong
            val num = BigInt(idfE6(df(w))) * tf * 220 * totalLen
            val den = BigInt(tf * 10000 + 3000) * totalLen +
              BigInt(9000) * dl * n
            ((2 * num + den) / (2 * den)).toLong
        }.sum
        (did, score)
      }
      scored.sortBy { case (did, s) => (-s, did) }.take(k).zipWithIndex
        .map { case ((did, s), i) => (qid, i + 1, did, s) }
    }
  }

  test("bm25TopK matches the naive scorer on a seeded random corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    val corpus = (0L until 30L).map { id =>
      id -> Seq.fill(3 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")
    } :+ (30L -> "") // a wordless doc still counts in N
    val df = corpus.toDF("doc_id", "text")
    val got = Retrieval.bm25TopK(df, df.filter(col("doc_id") < 3),
        "doc_id", "text", k = 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("score_e4"))).toSeq
      .sortBy(t => (t._1, t._2))
    val exp = naive(corpus, Set(0L, 1L, 2L), k = 5)
    assert(got === exp)
    assert(!got.exists(t => t._1 == t._3), "query doc retrieved itself")
  }

  test("bm25TopK hand fixture: rare terms outrank common ones") {
    import spark.implicits._
    val corpus = Seq(
      1L -> "apple banana apple",
      2L -> "banana cherry",
      3L -> "apple cherry cherry durian",
      4L -> "durian durian durian",
      5L -> "apple apple apple banana").toDF("doc_id", "text")
    val got = Retrieval.bm25TopK(corpus, corpus.filter(col("doc_id") === 4),
        "doc_id", "text", k = 10)
      .collect().map(r => (r.getAs[Int]("rank"), r.getAs[Long]("doc_id")))
    // 'durian' appears only in docs 3 and 4: querying doc 4 must rank
    // doc 3 first and nothing else (docs 1/2/5 share no term)
    assert(got.toSeq === Seq((1, 3L)))
  }

  test("rrfFuse: agreement dominates, integer contribs, id tie-breaks") {
    import spark.implicits._
    // doc 10 and doc 20 swap ranks 1/2 across the lists (same fused
    // total — tie must break to doc 10); docs 30/40 appear in one list
    // each at rank 3 (same total; doc 30 wins the tie)
    val a = Seq((1L, 10L, 1), (1L, 20L, 2), (1L, 30L, 3))
      .toDF("query_id", "doc_id", "rank")
    val b = Seq((1L, 20L, 1), (1L, 10L, 2), (1L, 40L, 3))
      .toDF("query_id", "doc_id", "rank")
    val got = Retrieval.rrfFuse(Seq(a, b), k = 10)
      .collect().map(r => (r.getAs[Int]("rank"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("rrf_e9"), r.getAs[Long]("n_lists"))).sortBy(_._1)
    val r61 = 1000000000L / 61; val r62 = 1000000000L / 62
    val r63 = 1000000000L / 63
    assert(got.toSeq === Seq(
      (1, 10L, r61 + r62, 2L), (2, 20L, r61 + r62, 2L),
      (3, 30L, r63, 1L), (4, 40L, r63, 1L)))
  }
}
