package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.functions._

/**
 * Text analysis for large-scale training-data pipelines: normalization,
 * token statistics, quality scoring, document fingerprinting, language ID.
 *
 * Everything here is a pure column expression — codegen'd, shuffle-free,
 * and embarrassingly parallel over document partitions, which is the shape
 * that survives 100 TB (no UDFs, no driver-side state).
 */
object TextOps {

  /** Lowercase, strip non-alphanumerics, collapse whitespace. */
  def normalized(text: Column): Column =
    trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))

  /** Whitespace tokens of the normalized text. */
  def words(text: Column): Column = split(normalized(text), " ")

  /** Distinct word n-grams of the normalized text, first-occurrence
   * order — single-pass codegen'd kernel ([[graft.functions.NGramOps]]);
   * identical semantics to composing [[words]] + transform + distinct.
   * NULL text yields an empty array (no shingles), like the composed
   * form. */
  def wordNGrams(text: Column, n: Int): Column =
    GraftSqlBridge.column(graft.functions.WordNGrams(
      GraftSqlBridge.expression(coalesce(text, lit(""))), n))

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(words(text))

  /** BPE-ish token estimate: alpha runs, digit runs, and single symbols
   * each count as one token (a cheap stand-in for a real tokenizer with
   * the same plumbing shape). */
  def tokenEstimate(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** English stopword slice used by quality scoring and language ID. */
  val stopwordsEn: Seq[String] =
    Seq("the", "and", "of", "to", "a", "in", "is", "it", "for", "on")

  private def countIn(ws: Column, lexicon: Seq[String]): Column =
    size(filter(ws, w => w.isin(lexicon.map(lit): _*)))

  /**
   * Quality features: char/word counts, mean word length, stopword ratio,
   * and a composite score — the length/stopword heuristics of standard
   * corpus-filtering recipes. The ratios are e4-quantized in pure
   * integer arithmetic — round-half-up as `(2·num·10⁴ + den) div
   * (2·den)` (the house convention; `round()` tie behavior differs
   * between engines) — with ONE final IEEE division each for the
   * reported double. The composite rides the quantized stop ratio:
   * quality·10⁶ = min(n_words, 100)·(10⁴ − stop_e4) exactly, then the
   * same e4 re-quantization. Zero-word docs get NULL ratios (the
   * division is undefined; an ANSI session would otherwise throw).
   */
  def qualityFeatures(df: DataFrame, text: Column): DataFrame = {
    val ws = words(text)
    df.withColumn("n_chars", length(text).cast("long"))
      .withColumn("n_words", size(ws).cast("long"))
      .withColumn("_ciw",
        length(regexp_replace(normalized(text), " ", "")).cast("long"))
      .withColumn("_stops", countIn(ws, stopwordsEn).cast("long"))
      .withColumn("_awl_e4", when(col("n_words") > 0,
        expr("(2 * _ciw * 10000 + n_words) div (2 * n_words)")))
      .withColumn("_sr_e4", when(col("n_words") > 0,
        expr("(2 * _stops * 10000 + n_words) div (2 * n_words)")))
      // quality_e4 is KEPT (long): downstream integer consumers
      // (percentileQualityGate's cutoff arithmetic) read it directly
      // instead of round-tripping the double back through round()
      .withColumn("quality_e4",
        expr("(2 * (least(n_words, 100) * (10000 - _sr_e4)) + 100) div 200"))
      .withColumn("avg_word_len", col("_awl_e4").cast("double") / 10000)
      .withColumn("stop_ratio", col("_sr_e4").cast("double") / 10000)
      .withColumn("quality_score", col("quality_e4").cast("double") / 10000)
      .drop("_ciw", "_stops", "_awl_e4", "_sr_e4")
  }

  /** Document fingerprint: md5 of the normalized text (stable across
   * whitespace/case variants — the oracle-checkable cousin of the rolling
   * hash in [[DedupOps.simhash]]). NULL text fingerprints like the empty
   * string — the library-wide convention ([[wordNGrams]],
   * [[graft.pipeline.CorpusOps.incrementalDedup]]); a NULL fingerprint
   * would silently drop the doc from inner joins on the key. */
  def fingerprint(text: Column): Column =
    md5(normalized(coalesce(text, lit(""))))

  /**
   * Winnowing document fingerprints (Schleimer, Wilkinson, Aiken —
   * "Winnowing: Local Algorithms for Document Fingerprinting",
   * SIGMOD'03): hash every k-gram of the normalized text, then keep the
   * minimum hash of each w-length window. Guarantees at least one shared
   * fingerprint for any match of length ≥ w + k − 1, which is the
   * plagiarism/near-dup detection primitive (MOSS). The k-gram hash is a
   * base-131 polynomial over char codes — exact in 64-bit for k = 8
   * (max ≈ 8.2e16), so Spark and the DuckDB oracle compute bit-identical
   * values with no modular reduction.
   */
  val winnowK = 8
  val winnowW = 4
  /** 131^0 .. 131^(k-1), most-significant first in the hash — used to
   * generate the engine-independent oracle SQL. */
  val pow131: IndexedSeq[Long] =
    Iterator.iterate(1L)(_ * 131L).take(winnowK).toIndexedSeq

  /** Distinct winnowed fingerprints of an ALREADY-normalized text column:
   * one codegen'd streaming pass per document (rolling polynomial +
   * monotonic-deque window minima — see [[graft.functions.WinnowOps]]).
   * A `substr`-per-gram array formulation re-scans the string per access
   * and goes quadratic in document length; this stays O(len). */
  def winnowFingerprints(norm: Column): Column =
    GraftSqlBridge.column(graft.functions.WinnowFingerprints(
      GraftSqlBridge.expression(norm), winnowK, winnowW))

  /** Per-language stopword lexicons for the n-gram/stopword language-ID
   * heuristic. */
  val lexicons: Seq[(String, Seq[String])] = Seq(
    "en" -> stopwordsEn,
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los", "se", "no"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "den"),
    "fr" -> Seq("le", "les", "des", "et", "est", "une", "dans", "que", "pour", "sur")
  )

  /**
   * Language ID: argmax of per-language stopword hits (ties resolved in
   * lexicon order, 'und' when nothing matches). A real model would slot in
   * behind the same column contract.
   */
  def languageId(text: Column): Column = {
    val ws = words(text)
    val scores = lexicons.map { case (lang, lex) => lang -> countIn(ws, lex) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und")) { case ((lang, score), acc) =>
      when(score === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /**
   * Feature-hashing ("hashing trick") document embedding — Weinberger et
   * al. 2009: every token maps to dimension `murmur3(w) mod dim` with a
   * hash-derived sign, giving a fixed-width integer vector with NO
   * vocabulary table — the text→vector bridge that lets the ANN family
   * (p6–p8, p14, p17, p28, p35/p37) run over raw documents. Integer
   * weights keep the representation (and its oracle) exact; a consumer
   * normalizes at use time.
   *
   * Shape: one explode (linear) + one (doc, dim) hash agg + one per-doc
   * agg — the token relation shuffles once on the doc id it already
   * carries. Emits the sparse vector as a "dim:weight" CSV (dim-ordered)
   * plus exact integer invariants, so the driver's hash compare needs no
   * float or array tolerance.
   */
  def hashEmbedding(df: DataFrame, idCol: String, textCol: String,
      dim: Int): DataFrame = {
    require(dim > 0, s"hashEmbedding dim must be positive, got $dim")
    val h = graft.functions.GraftFunctions
      .murmur3Positive(col("word"), 0).cast("long")
    // the sign comes from an INDEPENDENT hash (seed 1), not from bits of
    // the dimension hash — reusing the dim hash's bits couples sign to
    // dimension index for any dim that consumes those bits, which breaks
    // the unbiased-inner-product property the hashing trick exists for
    val hs = graft.functions.GraftFunctions
      .murmur3Positive(col("word"), 1).cast("long")
    df.select(col(idCol), explode(words(coalesce(col(textCol), lit(""))))
        .as("word"))
      .where(length(col("word")) > 0)
      .select(col(idCol), (h % dim).as("d"),
        when(hs % 2 === 0, lit(1L)).otherwise(lit(-1L)).as("sgn"))
      .groupBy(col(idCol), col("d"))
      .agg(sum(col("sgn")).as("w"))
      .where(col("w") =!= 0) // cancelled dims drop from the sparse form
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("nnz"),
        sum(abs(col("w"))).as("l1"),
        concat_ws(",", transform(
          array_sort(collect_list(struct(col("d"), col("w")))),
          s => concat(s.getField("d").cast("string"), lit(":"),
            s.getField("w").cast("string")))).as("sparse_csv"))
  }
}
