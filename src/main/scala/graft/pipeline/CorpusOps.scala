package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Corpus-curation operators for large-scale training-data pipelines —
 * the filtering / sampling / decontamination stages that sit between raw
 * crawl ingest and tokenization. Everything here is designed for the
 * 100 TB shape first:
 *
 *  - repetition stats and PII redaction are pure column expressions
 *    (zero shuffle, embarrassingly parallel over document partitions);
 *  - hash sampling and the token-budget mix shuffle once on the stratum
 *    key only;
 *  - decontamination broadcasts the (small) benchmark n-gram set so the
 *    corpus side never shuffles;
 *  - chunk-level dedup shuffles the corpus exactly once, on the chunk
 *    hash — the same linear-shuffle discipline as [[DedupOps]].
 */
object CorpusOps {

  // ------------------------------------------------------------ repetition

  /**
   * Gopher-style repetition statistics (Rae et al. 2021, "Scaling Language
   * Models", §A1.1): the fraction of duplicate words and the fraction of
   * bigrams claimed by the single most frequent bigram. High values mark
   * boilerplate / template spam that survives exact dedup.
   *
   * Shape: ZERO shuffle. The per-document bigram mode is computed by
   * sorting the bigram array in-row and folding a longest-equal-run scan
   * over it — O(n log n) per document — instead of the explode →
   * groupBy(doc, gram) → groupBy(doc) formulation, which would shuffle
   * every bigram of the corpus twice. At 100 TB the exploded bigram
   * relation is corpus-sized; the in-row fold never materializes it.
   */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ws = TextOps.words(col(textCol))
    val base = df
      .select(col(idCol), ws.as("ws"))
      .where(size(col("ws")) >= 2)
      .withColumn("n_words", size(col("ws")).cast("long"))
      .withColumn("n_distinct_words", size(array_distinct(col("ws"))).cast("long"))
      // sorted bigram array: equal bigrams become adjacent, so the mode
      // count is the longest run of equal neighbors
      .withColumn("gs", array_sort(expr(
        "transform(sequence(1, size(ws) - 1)," +
          " i -> concat_ws(' ', element_at(ws, i), element_at(ws, i + 1)))")))
    base
      .withColumn("n_bigrams", size(col("gs")).cast("long"))
      .withColumn("top_bigram_count", expr(
        """aggregate(gs,
          |  named_struct('prev', cast(null as string), 'run', 0L, 'best', 0L),
          |  (acc, g) -> named_struct(
          |    'prev', g,
          |    'run',  if(acc.prev <=> g, acc.run + 1L, 1L),
          |    'best', greatest(acc.best, if(acc.prev <=> g, acc.run + 1L, 1L))),
          |  acc -> acc.best)""".stripMargin))
      .select(col(idCol),
        col("n_words"), col("n_distinct_words"),
        round(lit(1.0) - col("n_distinct_words") / col("n_words"), 4)
          .as("dup_word_frac"),
        col("n_bigrams"), col("top_bigram_count"),
        round(col("top_bigram_count") / col("n_bigrams"), 4)
          .as("top_bigram_frac"))
  }

  // ------------------------------------------------------------------ PII

  /** Detection patterns shared by the engine and the oracle. RE2-safe
   * (no lookaround/backrefs) so the same text works in both dialects. */
  val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val phoneRe = "\\+1-\\d{3}-\\d{4}"

  /**
   * PII scrubbing: count and redact email addresses, IPv4 literals, and
   * phone numbers. Replacement order is fixed (email → ip → phone) so the
   * redacted text is deterministic. Pure column expressions — codegen'd
   * regex over each row, no shuffle, no UDF.
   */
  def piiRedact(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    // null-safe: a null payload must count 0 and hash like the empty
    // string, not propagate size(null) = -1 into the counts
    val p = coalesce(col(payloadCol), lit(""))
    val redacted =
      regexp_replace(
        regexp_replace(
          regexp_replace(p, emailRe, "<EMAIL>"),
          ipv4Re, "<IP>"),
        phoneRe, "<PHONE>")
    df.select(col(idCol),
      size(regexp_extract_all(p, lit(emailRe), lit(0))).as("n_emails"),
      size(regexp_extract_all(p, lit(ipv4Re), lit(0))).as("n_ips"),
      size(regexp_extract_all(p, lit(phoneRe), lit(0))).as("n_phones"),
      md5(redacted.cast("binary")).as("redacted_md5"))
  }

  // ------------------------------------------------------------- sampling

  /** Deterministic per-row sampling key: uniform over hex strings, stable
   * across engines and runs (md5, not a seeded RNG — reproducible sampling
   * is a hard requirement for training-data lineage). */
  def sampleKey(text: Column, id: Column): Column =
    md5(concat(coalesce(text, lit("")), lit(":"), id.cast("string"))
      .cast("binary"))

  /**
   * Stratified deterministic Bernoulli sample: each stratum keeps rows
   * whose sample-key prefix falls below the stratum's threshold (2 hex
   * chars ⇒ rate = (threshold+1)/256). One hash + one string compare per
   * row, then a single aggregation shuffle on the stratum key — the whole
   * corpus is never re-partitioned. The kept-id digest makes the *exact
   * membership* of the sample checkable, not just its size.
   */
  def stratifiedSample(df: DataFrame, stratum: Column, threshold: Column,
      id: Column, text: Column): DataFrame = {
    val keep = substring(sampleKey(text, id), 1, 2) <= threshold
    df.groupBy(stratum.as("stratum"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(keep, 1L).otherwise(0L)).as("n_sampled"),
        md5(concat_ws(",",
          transform(sort_array(collect_list(when(keep, id))),
            x => x.cast("string"))).cast("binary")).as("sampled_md5"))
  }

  /**
   * Token-budget mixing: within each stratum, rank documents by the
   * deterministic sample key and keep the prefix whose cumulative token
   * count stays within the budget — how a training mix hits "N tokens of
   * source X" reproducibly. One shuffle (on the stratum key); the running
   * sum is an in-partition window. At 100 TB strata outgrow one task —
   * then the two-level cum-sum pattern of [[graft.operators.LogOps]]
   * (`retainBySize`) applies unchanged; fixture strata are single-task.
   */
  def tokenBudgetMix(df: DataFrame, stratum: Column, budget: Long,
      id: Column, text: Column): DataFrame = {
    val w = Window.partitionBy("stratum").orderBy(col("rk"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(stratum.as("stratum"), id.as("id"), text.as("text"))
      .withColumn("rk", sampleKey(col("text"), col("id")))
      .withColumn("n_tok", TextOps.tokenCount(col("text")).cast("long"))
      .withColumn("cum_tok", sum(col("n_tok")).over(w))
      .where(col("cum_tok") <= budget)
      .groupBy(col("stratum"))
      .agg(
        count(lit(1)).as("n_docs_kept"),
        sum(col("n_tok")).as("tokens_kept"),
        md5(concat_ws(",",
          transform(sort_array(collect_list(col("id"))), x => x.cast("string")))
          .cast("binary")).as("kept_md5"))
  }

  // ------------------------------------------------------ decontamination

  /** Distinct word n-grams of a document as an array column. */
  private def ngramSet(ws: Column, n: Int): Column =
    array_distinct(expr(
      s"transform(sequence(1, size(ws) - ${n - 1})," +
        s" i -> concat_ws(' ', slice(ws, i, $n)))"))

  /**
   * Benchmark decontamination (GPT-3 appendix C / PaLM §8 style): flag
   * corpus documents sharing any word n-gram with a held-out benchmark
   * set. The benchmark side is tiny by construction, so its distinct
   * n-gram set is BROADCAST and the corpus side joins map-side — the
   * corpus is never shuffled, which is the only shape that survives
   * "check 100 TB against a 100 MB eval suite".
   */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame = {
    // explicit repartition before the gram explode: the scan is a few
    // parquet files, and AQE would otherwise run the compute-heavy
    // n-gram construction on that handful of input splits (same
    // rationale as DedupOps.shingleRows)
    val parts = corpus.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "32").toInt
    def grams(df: DataFrame): DataFrame = df
      .repartition(parts, col(idCol))
      .select(col(idCol), TextOps.words(col(textCol)).as("ws"))
      .where(size(col("ws")) >= n)
      .select(col(idCol), explode(ngramSet(col("ws"), n)).as("gram"))
    val benchGrams = grams(benchmark).select(col("gram")).distinct()
    grams(corpus)
      .join(broadcast(benchGrams), Seq("gram"), "inner")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared")) // grams are distinct per doc
  }

  // ---------------------------------------------------------- chunk dedup

  /**
   * Sub-document (chunk-level) exact dedup, RefinedWeb/MassiveText style:
   * split each document into consecutive `chunkWords`-word chunks, hash
   * them, and measure how much of each source is duplicated text at chunk
   * granularity — catches page templates that whole-document dedup misses.
   *
   * Shape: the corpus shuffles exactly once, on the chunk hash (count per
   * hash with map-side partials), then the per-hash counts join back and
   * aggregate per source. Chunk hashes are near-unique, so the join is
   * skew-free by construction.
   */
  def chunkDupStats(df: DataFrame, idCol: String, textCol: String,
      sourceCol: String, chunkWords: Int): DataFrame = {
    // null-safe: null text chunks like the empty string; without the
    // coalesce, size(null) = -1 turns the chunk-index sequence into
    // sequence(0, -1) = [0, -1] and emits two phantom null chunks
    val chunks = df
      .select(col(idCol), col(sourceCol),
        TextOps.words(coalesce(col(textCol), lit(""))).as("ws"))
      .select(col(idCol), col(sourceCol), explode(expr(
        s"""transform(sequence(0, cast(ceil(size(ws) / ${chunkWords}.0) as int) - 1),
           |  i -> concat_ws(' ', slice(ws, i * $chunkWords + 1, $chunkWords)))"""
          .stripMargin)).as("chunk"))
      .select(col(idCol), col(sourceCol), md5(col("chunk").cast("binary")).as("h"))
    val byHash = chunks.groupBy(col("h")).agg(count(lit(1)).as("c"))
    chunks.join(byHash, Seq("h"))
      .groupBy(col(sourceCol))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("c") > 1, 1L).otherwise(0L)).as("n_dup_chunks"),
        countDistinct(when(col("c") > 1, col(idCol))).as("n_docs_with_dup"))
  }

  // --------------------------------------------------------- quantization

  /**
   * Per-vector int8 scalar quantization (the standard ANN-index
   * compression: 4 bytes/dim → 1): q_i = ⌊(x_i − min)/scale + ½⌋ with
   * scale = (max − min)/255. Emits integer invariants of the quantized
   * vector (sum, first element) plus the scale in integer ppm, so the
   * oracle check is exact — no float-tolerance holes. Pure column
   * expressions, zero shuffle; every op is deterministic IEEE double math
   * so engine and oracle agree bit-for-bit.
   */
  def quantizeStats(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val e = transform(col(vecCol), x => x.cast("double"))
    val mn = array_min(e)
    val mx = array_max(e)
    val scale = (mx - mn) / lit(255.0)
    val q = transform(e, x =>
      when(scale === 0.0, lit(0L)).otherwise(floor((x - mn) / scale + lit(0.5))))
    df.select(col(idCol),
      floor(scale * lit(1000000.0)).cast("long").as("scale_ppm"),
      aggregate(q, lit(0L), (acc, x) => acc + x).as("q_sum"),
      // try_: an empty (zero-dim) vector yields NULL, not a thrown
      // INVALID_ARRAY_INDEX from deep inside a 100 TB scan
      try_element_at(q, lit(1)).cast("int").as("q_first"),
      size(e).as("dim"))
  }
}
