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
   * Determinism: each per-term contribution is ONE fixed double
   * expression — identical association order on any ANSI engine — scaled
   * ×10⁴ and rounded to a BIGINT **before** the per-(query, doc) sum, so
   * partial-aggregation order can never move a total, and ranking ties
   * break on the neighbor id. (The ln is the only non-correctly-rounded
   * step; after the ×10⁴ rounding a 1-ulp libm difference is invisible —
   * the bigram-LM scorer set this precedent.) dl/avgdl is expanded to
   * dl·N/Σdl so there is no intermediate average to re-round.
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
    val idf = log(lit(1) + (col("n_docs") - col("df") + lit(0.5)) /
      (col("df") + lit(0.5)))
    val denom = col("tf") + lit(k1) * (lit(1 - b) +
      lit(b) * col("dl") * col("n_docs") / col("total_len"))
    val contrib = round(idf * (col("tf") * lit(k1 + 1)) / denom *
      lit(10000.0), 0).cast("long")
    val scored = tf
      .join(broadcast(qterms), Seq("word"))
      .filter(col("did") =!= col("qid"))
      .join(dl, Seq("did"))
      .join(broadcast(dfq), Seq("word"))
      .crossJoin(broadcast(stats))
      .select(col("qid"), col("did"), contrib.as("c_e4"))
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
