package graft.queries

import graft.pipeline.CorpusOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Corpus-curation stage queries (p21–p27): repetition filtering, PII
 * redaction, reproducible sampling, token-budget mixing, benchmark
 * decontamination, chunk-level dedup, and embedding quantization — the
 * operators between raw crawl and tokenizer in a training-data pipeline.
 * Every query has a full DuckDB oracle; outputs are integers, md5
 * digests, or 4-decimal rounds of deterministic doubles, so the driver's
 * hash compare is exact (no float-tolerance holes).
 */
object CorpusQueries extends QueryGroup {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
  private def embs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  /** DuckDB mirror of TextOps.normalized / TextOps.words (same strings as
   * PipelineQueries — kept private there, restated here). */
  private val NORM = "trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))"
  private val WORDS = s"string_split($NORM, ' ')"

  // ------------------------------------------------- p21 repetition stats

  private val p21 = QueryDef(
    // Engine computes the bigram mode with an in-row sorted-run fold
    // (zero shuffle); the oracle re-derives it the heavyweight way —
    // unnest + group-count + max — so parity checks the algorithm, not a
    // shared formulation.
    (s, d) => CorpusOps.repetitionStats(docs(s, d), "doc_id", "text")
      .orderBy(col("doc_id")),
    Some(s"""WITH w AS (SELECT doc_id, $WORDS AS ws FROM documents),
      |f AS (
      |  SELECT doc_id, ws, len(ws) AS n_words,
      |         len(list_distinct(ws)) AS n_distinct_words
      |  FROM w WHERE len(ws) >= 2),
      |g AS (
      |  SELECT doc_id,
      |         unnest(list_transform(range(1, len(ws)),
      |           i -> ws[i] || ' ' || ws[i+1])) AS gram
      |  FROM f),
      |cnt AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY 1, 2),
      |top AS (
      |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
      |         CAST(max(c) AS BIGINT) AS top_bigram_count
      |  FROM cnt GROUP BY 1)
      |SELECT f.doc_id, n_words, n_distinct_words,
      |       round(1.0 - CAST(n_distinct_words AS DOUBLE) / n_words, 4)
      |         AS dup_word_frac,
      |       n_bigrams, top_bigram_count,
      |       round(CAST(top_bigram_count AS DOUBLE) / n_bigrams, 4)
      |         AS top_bigram_frac
      |FROM f JOIN top ON f.doc_id = top.doc_id
      |ORDER BY f.doc_id""".stripMargin))

  // --------------------------------------------------- p22 PII redaction

  /** Deterministic PII injection so the fixture actually contains emails /
   * IPs / phones with data-dependent presence (documents are word salad). */
  private def piiPayload(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).withColumn("payload", concat(
      col("text"),
      when(col("doc_id") % 3 =!= 0,
        concat(lit(" contact user"), col("doc_id").cast("string"),
          lit("@mail.example.com"))).otherwise(lit("")),
      when(col("doc_id") % 2 === 0,
        concat(lit(" from 10."), (col("doc_id") % 200).cast("string"),
          lit(".0.7"))).otherwise(lit("")),
      when(col("doc_id") % 5 === 1,
        concat(lit(" call +1-555-"),
          ((col("doc_id") % 9000) + 1000).cast("string"))).otherwise(lit(""))))

  // single line: a leading "||" would be eaten by the enclosing query's
  // stripMargin when this fragment is interpolated into it
  private val piiPayloadSql: String =
    "text || CASE WHEN doc_id % 3 <> 0 THEN ' contact user' || doc_id || " +
      "'@mail.example.com' ELSE '' END || CASE WHEN doc_id % 2 = 0 THEN " +
      "' from 10.' || (doc_id % 200) || '.0.7' ELSE '' END || " +
      "CASE WHEN doc_id % 5 = 1 THEN ' call +1-555-' || " +
      "(doc_id % 9000 + 1000) ELSE '' END"

  private val p22 = QueryDef(
    (s, d) => CorpusOps.piiRedact(piiPayload(s, d), "doc_id", "payload")
      .orderBy(col("doc_id")),
    Some(s"""WITH p AS (SELECT doc_id, $piiPayloadSql AS payload FROM documents)
      |SELECT doc_id,
      |  len(regexp_extract_all(payload, '${CorpusOps.emailRe}')) AS n_emails,
      |  len(regexp_extract_all(payload, '${CorpusOps.ipv4Re}')) AS n_ips,
      |  len(regexp_extract_all(payload, '${CorpusOps.phoneRe}')) AS n_phones,
      |  md5(regexp_replace(regexp_replace(regexp_replace(payload,
      |        '${CorpusOps.emailRe}', '<EMAIL>', 'g'),
      |        '${CorpusOps.ipv4Re}', '<IP>', 'g'),
      |        '${CorpusOps.phoneRe}', '<PHONE>', 'g')) AS redacted_md5
      |FROM p ORDER BY doc_id""".stripMargin))

  // ------------------------------------------- p23 stratified hash sample

  /** Per-stratum threshold on the first 2 hex chars of the sample key:
   * even-numbered sources keep ≤'19' (rate 26/256 ≈ 10%), odd ≤'33'
   * (52/256 ≈ 20%). */
  private val thrSql =
    "CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0 THEN '19' ELSE '33' END"

  private val p23 = QueryDef(
    (s, d) => CorpusOps.stratifiedSample(docs(s, d),
      stratum = col("source"),
      threshold = when(substring(col("source"), 4, 10).cast("int") % 2 === 0,
        lit("19")).otherwise(lit("33")),
      id = col("doc_id"), text = col("text"))
      .orderBy(col("stratum")),
    Some(s"""WITH k AS (
      |  SELECT source, doc_id,
      |         substr(md5(text || ':' || doc_id), 1, 2) <= ($thrSql) AS keep
      |  FROM documents)
      |SELECT source AS stratum, count(*) AS n_docs,
      |       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
      |       md5(coalesce(string_agg(
      |         CASE WHEN keep THEN CAST(doc_id AS VARCHAR) END,
      |         ',' ORDER BY doc_id), '')) AS sampled_md5
      |FROM k GROUP BY source ORDER BY stratum""".stripMargin))

  // --------------------------------------------- p24 token-budget mixing

  private val mixBudget = 1500L

  private val p24 = QueryDef(
    (s, d) => CorpusOps.tokenBudgetMix(docs(s, d),
      stratum = col("source"), budget = mixBudget,
      id = col("doc_id"), text = col("text"))
      .orderBy(col("stratum")),
    Some(s"""WITH t AS (
      |  SELECT source, doc_id, md5(text || ':' || doc_id) AS rk,
      |         len($WORDS) AS n_tok
      |  FROM documents),
      |c AS (
      |  SELECT *, sum(n_tok) OVER (PARTITION BY source
      |    ORDER BY rk, doc_id ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM t)
      |SELECT source AS stratum, count(*) AS n_docs_kept,
      |       CAST(sum(n_tok) AS BIGINT) AS tokens_kept,
      |       md5(coalesce(string_agg(CAST(doc_id AS VARCHAR), ','
      |         ORDER BY doc_id), '')) AS kept_md5
      |FROM c WHERE cum <= $mixBudget
      |GROUP BY source ORDER BY stratum""".stripMargin))

  // --------------------------------------------- p25 decontamination

  /** Held-out "benchmark" slice: every 50th document. */
  private val p25 = QueryDef(
    (s, d) => {
      val all = docs(s, d)
      CorpusOps.decontaminate(
        corpus = all.filter(col("doc_id") % 50 =!= 0),
        benchmark = all.filter(col("doc_id") % 50 === 0),
        idCol = "doc_id", textCol = "text", n = 5)
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH w AS (SELECT doc_id, $WORDS AS ws FROM documents),
      |g AS (
      |  SELECT doc_id,
      |         list_distinct(list_transform(range(1, len(ws) - 3),
      |           i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' '
      |                || ws[i+3] || ' ' || ws[i+4])) AS gs
      |  FROM w WHERE len(ws) >= 5),
      |inv AS (SELECT doc_id, unnest(gs) AS gram FROM g),
      |bench AS (SELECT DISTINCT gram FROM inv WHERE doc_id % 50 = 0)
      |SELECT i.doc_id, count(*) AS n_shared
      |FROM inv i JOIN bench b ON i.gram = b.gram
      |WHERE i.doc_id % 50 <> 0
      |GROUP BY i.doc_id ORDER BY i.doc_id""".stripMargin))

  // --------------------------------------------------- p26 chunk dedup

  private val chunkWords = 20

  private val p26 = QueryDef(
    (s, d) => CorpusOps.chunkDupStats(docs(s, d), "doc_id", "text",
      "source", chunkWords).orderBy(col("source")),
    Some(s"""WITH w AS (SELECT doc_id, source, $WORDS AS ws FROM documents),
      |c AS (
      |  SELECT doc_id, source,
      |         unnest(list_transform(
      |           range(0, CAST(ceil(len(ws) / $chunkWords.0) AS INT)),
      |           i -> array_to_string(
      |             ws[i * $chunkWords + 1 : i * $chunkWords + $chunkWords],
      |             ' '))) AS chunk
      |  FROM w),
      |h AS (SELECT doc_id, source, md5(chunk) AS h FROM c),
      |cnt AS (SELECT h, count(*) AS c FROM h GROUP BY 1)
      |SELECT source, count(*) AS n_chunks,
      |       CAST(sum(CASE WHEN cnt.c > 1 THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_dup_chunks,
      |       count(DISTINCT CASE WHEN cnt.c > 1 THEN doc_id END)
      |         AS n_docs_with_dup
      |FROM h JOIN cnt USING (h)
      |GROUP BY source ORDER BY source""".stripMargin))

  // -------------------------------------- p27 embedding quantization

  private val p27 = QueryDef(
    (s, d) => CorpusOps.quantizeStats(embs(s, d), "vec_id", "embedding")
      .orderBy(col("vec_id")),
    Some("""WITH q AS (
      |  SELECT vec_id,
      |         CAST(list_aggregate(embedding, 'min') AS DOUBLE) AS mn,
      |         CAST(list_aggregate(embedding, 'max') AS DOUBLE) AS mx,
      |         len(embedding) AS dim
      |  FROM embeddings),
      |s AS (
      |  SELECT vec_id, mn, (mx - mn) / CAST(255 AS DOUBLE) AS scale, dim
      |  FROM q)
      |SELECT s.vec_id,
      |       CAST(floor(scale * 1000000.0) AS BIGINT) AS scale_ppm,
      |       CAST(list_aggregate(list_transform(e.embedding,
      |         x -> floor((CAST(x AS DOUBLE) - mn) / scale + 0.5)), 'sum')
      |         AS BIGINT) AS q_sum,
      |       CAST(floor((CAST(e.embedding[1] AS DOUBLE) - mn) / scale + 0.5)
      |         AS INT) AS q_first,
      |       CAST(dim AS INT) AS dim
      |FROM s JOIN embeddings e ON s.vec_id = e.vec_id
      |ORDER BY s.vec_id""".stripMargin))

  override val defs: Map[String, QueryDef] = Map(
    "p21_repetition_stats" -> p21,
    "p22_pii_redaction" -> p22,
    "p23_stratified_sample" -> p23,
    "p24_token_budget_mix" -> p24,
    "p25_decontaminate" -> p25,
    "p26_chunk_dedup" -> p26,
    "p27_embed_quantize" -> p27
  )
}
