package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Full-text retrieval over the document corpus — the ranked-search stage a
 * curation pipeline uses to pull related documents (near-topic sampling,
 * retrieval-augmented filtering, analyst search over a 100 TB crawl).
 */
object Retrieval {

  /**
   * Okapi BM25 top-k retrieval (Robertson et al., TREC-3 1994, in the
   * k1/b parameterization; idf is the non-negative shifted form
   * ln(1 + (N − df + ½)/(df + ½)) so a term in most documents can never
   * subtract score):
   *
   *   score(q, d) = Σ_t  idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
   *
   * Determinism (exact-integer, the q33/q37 convention): requires k1 and
   * b to be multiples of 0.01 so both become integers ×100; idf is
   * materialized ONCE per query-vocabulary term as `idf_e6 =
   * floor(ln((2N+2)/(2df+1))·10⁶ + 0.5)` — a single libm `ln` of one
   * exact integer ratio, quantized to 1e-6 so a 1-ulp engine difference
   * lands ~10 orders of magnitude away from a rounding boundary — and
   * every per-term contribution after that is pure integer arithmetic: a
   * DECIMAL(38,0) cross-multiplication with explicit round-half-up
   * `(2·num + den) div (2·den)`, summed per (query, doc) as BIGINTs, so
   * neither partial-aggregation order nor float association can ever
   * move a total. Ranking ties break on the neighbor id. dl/avgdl is
   * expanded to dl·N/Σdl so no intermediate average exists at all.
   *
   * Shape at 100 TB: the corpus pays one explode + (doc, word) hash agg
   * for tf (map-side partials), a per-doc length agg, and a
   * query-vocabulary-bounded df agg; postings for query terms only are
   * selected by a BROADCAST semi join of the (tiny) query-term set, so
   * the corpus-wide posting list never shuffles on anything but its own
   * aggregation keys. The global (N, Σdl) stats ride a 1-row broadcast
   * cross join. Top-k per query is a rank window over the candidate set
   * partitioned by query — never a global sort, never a corpus self-join.
   */
  def bm25TopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      textCol: String, k: Int, k1: Double = 1.2, b: Double = 0.75)
      : DataFrame = {
    val k1E2 = math.round(k1 * 100).toInt
    val bE2 = math.round(b * 100).toInt
    require(math.abs(k1E2 - k1 * 100) < 1e-9 &&
      math.abs(bE2 - b * 100) < 1e-9 && bE2 >= 0 && bE2 <= 100 && k1E2 >= 0,
      "k1 and b must be non-negative multiples of 0.01 (b <= 1)")
    val toks = corpus
      .select(col(idCol).as("did"),
        explode(TextOps.words(col(textCol))).as("word"))
      .where(length(col("word")) > 0)
    val tf = graft.CacheScope.track(
      toks.groupBy(col("did"), col("word")).agg(count(lit(1)).as("tf")))
    val dl = tf.groupBy(col("did")).agg(sum(col("tf")).as("dl"))
    // the 1-row global stats: N over ALL docs (a wordless doc is still a
    // document), Σdl over docs that have words (absent rows add zero)
    val stats = corpus.agg(count(lit(1)).as("n_docs"))
      .crossJoin(dl.agg(sum(col("dl")).as("total_len")))
    val qterms = queries
      .select(col(idCol).as("qid"),
        explode(array_distinct(TextOps.words(col(textCol)))).as("word"))
      .where(length(col("word")) > 0)
    // df restricted to the query vocabulary BEFORE the aggregation —
    // the full-vocabulary df relation is never materialized
    val dfq = tf.join(broadcast(qterms.select(col("word")).distinct()),
        Seq("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("df"))
    // idf_e6 materialized ONCE per query-vocabulary term (a ≤|q-vocab|
    // relation): ln((2N+2)/(2df+1)) = ln(1 + (N−df+½)/(df+½)) — one
    // exact integer ratio into libm, then the e6 quantization
    val idfq = dfq.crossJoin(broadcast(stats.select(col("n_docs"))))
      .withColumn("idf_e6",
        floor(log((col("n_docs") * 2 + 2).cast("double") /
          (col("df") * 2 + 1).cast("double")) * lit(1000000.0) + 0.5)
          .cast("long"))
      .select(col("word"), col("df"), col("idf_e6"))
    // c_e4 = round(idf·tf·(k1+1) / (tf + k1(1−b) + k1·b·dl·N/L) · 10⁴)
    // as exact rationals: num = idf_e6·tf·(k1E2+100)·L and
    // den = (tf·10⁴ + k1E2·(100−bE2))·L + k1E2·bE2·dl·N, both in
    // DECIMAL(38,0) (num can pass 2⁶³ once Σdl reaches corpus scale),
    // with explicit round-half-up (2·num + den) div (2·den).
    val scored = tf
      .join(broadcast(qterms), Seq("word"))
      .filter(col("did") =!= col("qid"))
      .join(dl, Seq("did"))
      .join(broadcast(idfq), Seq("word"))
      .crossJoin(broadcast(stats))
      .withColumn("num", expr(
        s"CAST(idf_e6 AS DECIMAL(38,0)) * tf * ${k1E2 + 100} * total_len"))
      .withColumn("den", expr(
        s"(tf * 10000 + ${k1E2 * (100 - bE2)}) * " +
          s"CAST(total_len AS DECIMAL(38,0)) + " +
          s"${k1E2 * bE2} * CAST(dl AS DECIMAL(38,0)) * n_docs"))
      .select(col("qid"), col("did"),
        expr("(2 * num + den) div (2 * den)").as("c_e4"))
      .groupBy(col("qid"), col("did")).agg(sum(col("c_e4")).as("score_e4"))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(col("score_e4").desc, col("did"))))
      .where(col("rank") <= k)
      .select(col("qid").as("query_id"), col("rank").cast("int").as("rank"),
        col("did").as("doc_id"), col("score_e4"))
  }

  /**
   * Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009) —
   * the standard hybrid-search combiner: fuse k-bounded rankings from
   * heterogeneous retrievers (lexical BM25, embedding cosine, …) by
   * summing 1/(c + rank) per list, so agreement between lists dominates
   * any single list's score scale. The contribution is the exact integer
   * 10⁹ div (c + rank) — no float division anywhere, so fusion totals
   * and tie behavior are engine-independent; ties rank by doc id.
   *
   * Inputs carry (query_id, doc_id, rank) with 1-based ranks. Shape at
   * any scale: each input is already top-k per query (|queries|·k rows),
   * so the union, the fusion aggregate, and the rank window all operate
   * on k-bounded relations — the corpus-scale work lives in the
   * upstream retrievers, which are audited separately.
   */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, c: Int = 60): DataFrame = {
    require(rankings.nonEmpty)
    val u = rankings.map(_.select(col("query_id"), col("doc_id"),
        col("rank").cast("long").as("rank")))
      .reduce(_ unionByName _)
      .withColumn("contrib", expr(s"1000000000 div ($c + rank)"))
    u.groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("contrib")).as("rrf_e9"), count(lit(1)).as("n_lists"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("rrf_e9").desc, col("doc_id"))))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("int").as("rank"),
        col("doc_id"), col("rrf_e9"), col("n_lists"))
  }
}
