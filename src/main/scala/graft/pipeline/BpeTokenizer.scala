package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One tokenized document: subword token count, an exact digest of the
 * token stream (space-joined), and a digest of the DETOKENIZED text
 * (tokens concatenated, `</w>` back to spaces) — which must equal the
 * normalized source text, so an oracle can recompute it without running
 * BPE at all. */
case class BpeDoc(doc_id: Long, n_words: Long, n_tokens: Long,
    tokens_md5: String, detok_md5: String)

/**
 * Byte-pair encoding (Sennrich, Haddow, Birch 2016, arXiv:1508.07909) —
 * a REAL subword tokenizer, not the regex token estimate of
 * [[TextOps.tokenEstimate]]: merges are learned from corpus statistics
 * and applied by rank, exactly the HuggingFace/GPT-2 scheme (word-final
 * `</w>` marker variant of the original paper).
 *
 * Scale split (the part that matters at 100 TB):
 *  - The only corpus-scale work in TRAINING is one word-count shuffle —
 *    BPE trains on the (word, count) frequency table. That table is NOT
 *    corpus-row-sized, but it IS corpus-scaling: raw word-TYPE counts
 *    grow by Heaps' law (typos, URLs, numerals — billions of types on a
 *    web corpus), so the driver-side merge loop's input must be bounded
 *    explicitly, never on trust. Two bounds, both distributed:
 *    (1) a frequency-floor prune (`minCount`, the standard BPE practice
 *    — Sennrich's own released scripts expose it) applied to the count
 *    relation BEFORE collect, which cuts the Heaps'-law tail where it
 *    lives; merges learned over the pruned vocab are exact for the
 *    pruned contract, and APPLICATION still tokenizes every word
 *    (unpruned types just stop at the merges their subwords earn);
 *    (2) a `maxVocabTypes` REFUSE: the pruned relation is collected
 *    through a distributed `limit(maxVocabTypes + 1)`, so the driver
 *    holds at most bound+1 rows even on the refusing path — the guard
 *    cannot itself OOM first (the TableView maxKeys discipline). The
 *    error names the bound and the remedy (raise `minCount`). The merge
 *    loop itself is inherently sequential (merge i+1 depends on merge
 *    i), so running it where the BOUNDED vocab table lands is the
 *    honest layout: ≤ 2²⁴ types × ~64 B ≈ 1 GB — dimension-table sized
 *    BY CONSTRUCTION, not by hope.
 *  - APPLICATION broadcasts the merge ranks (numMerges entries) and
 *    tokenizes per partition — embarrassingly parallel, zero shuffle on
 *    the corpus. `mapPartitions` is justified here for the same reason
 *    as the wire codecs: the merge loop per word is imperative with a
 *    shared rank table, not a Catalyst expression.
 */
object BpeTokenizer {

  /** Word-end marker (Sennrich et al. §3.2): lets the model distinguish
   * word-final subwords and makes detokenization exact. */
  val EndOfWord = "</w>"

  /** Ceiling on word TYPES the driver-side merge loop may hold: 2²⁴
   * types × ~64 B ≈ 1 GB of driver heap. Enforced distributed (the
   * pruned count relation is collected through `limit(bound + 1)`), so
   * crossing it REFUSES by name instead of OOMing — the remedy is a
   * higher `minCount` floor, which prunes the Heaps'-law type tail
   * where it lives. */
  val DefaultMaxVocabTypes: Int = 1 << 24

  private def toSymbols(word: String): Vector[String] =
    word.map(_.toString).toVector :+ EndOfWord

  /** Adjacent-pair frequencies of a symbolized vocab. */
  private def pairCounts(vocab: Map[Vector[String], Long]): Map[(String, String), Long] = {
    val m = scala.collection.mutable.Map.empty[(String, String), Long]
    vocab.foreach { case (syms, c) =>
      var i = 0
      while (i < syms.length - 1) {
        val p = (syms(i), syms(i + 1))
        m.update(p, m.getOrElse(p, 0L) + c)
        i += 1
      }
    }
    m.toMap
  }

  /** Merge every non-overlapping occurrence of `pair` left-to-right. */
  private def mergePair(syms: Vector[String], pair: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += (pair._1 + pair._2); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /**
   * Learn `numMerges` merges from a (word, count) frequency table.
   * Deterministic: the most frequent pair wins, ties broken by
   * lexicographic pair order — reruns and engines agree bit-for-bit.
   */
  def trainFromCounts(counts: Seq[(String, Long)],
      numMerges: Int): Seq[(String, String)] = {
    var vocab: Map[Vector[String], Long] = counts
      .groupBy { case (w, _) => toSymbols(w) }
      .map { case (syms, ws) => syms -> ws.map(_._2).sum }
    val merges = Seq.newBuilder[(String, String)]
    var i = 0
    var exhausted = false
    while (i < numMerges && !exhausted) {
      val pc = pairCounts(vocab)
      if (pc.isEmpty) exhausted = true
      else {
        val best = pc.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        // merged keys never collide: the symbol concatenation always
        // equals word + EndOfWord, which mergePair preserves
        vocab = vocab.map { case (syms, c) => mergePair(syms, best) -> c }
        i += 1
      }
    }
    merges.result()
  }

  /** Tokenize one word with a learned rank table: repeatedly merge the
   * lowest-rank adjacent pair present (the GPT-2 apply loop). */
  def encodeWord(word: String, ranks: Map[(String, String), Int]): Vector[String] = {
    var syms = toSymbols(word)
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestPair: (String, String) = null
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestPair = (syms(i), syms(i + 1)) }
        i += 1
      }
      if (bestPair == null) done = true
      else syms = mergePair(syms, bestPair)
    }
    syms
  }

  /**
   * End-to-end: learn merges from THIS corpus (one word-count shuffle,
   * a distributed `minCount` frequency-floor prune, then the BOUNDED
   * merge loop), and tokenize every document with the broadcast rank
   * table. Output digests the exact token stream per doc.
   *
   * `minCount` is part of the query contract: merges are learned from
   * word types occurring ≥ `minCount` times (exact for that contract —
   * the oracle fixture replays the same floor); every word is still
   * TOKENIZED. `maxVocabTypes` bounds what the driver may materialize:
   * past it the call REFUSES by name rather than collecting — the
   * driver never holds more than `maxVocabTypes + 1` rows even then,
   * because the limit is applied distributed before collect.
   */
  def tokenize(df: DataFrame, idCol: String, textCol: String,
      numMerges: Int, minCount: Long = 1L,
      maxVocabTypes: Int = DefaultMaxVocabTypes): Dataset[BpeDoc] = {
    val spark = df.sparkSession
    import spark.implicits._
    val counts = df
      .select(explode(TextOps.words(col(textCol))).as("word"))
      .where(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("c"))
      .where(col("c") >= minCount) // distributed floor BEFORE collect
      .limit(maxVocabTypes + 1)    // distributed ceiling: ≤ bound+1 rows land
      .as[(String, Long)].collect()
    if (counts.length > maxVocabTypes) throw new IllegalStateException(
      s"BPE vocabulary exceeds maxVocabTypes=$maxVocabTypes word types at " +
        s"minCount=$minCount: the merge loop's input is driver-resident and " +
        "word-TYPE counts are corpus-scaling (Heaps' law), so collecting an " +
        "unbounded vocabulary would OOM the driver before training begins; " +
        "raise minCount (the standard BPE frequency floor — pruned-vocab " +
        "merges are exact for the pruned contract) or raise maxVocabTypes " +
        "with the driver heap to match")
    val merges = trainFromCounts(counts.toSeq, numMerges)
    val ranks = spark.sparkContext.broadcast(
      merges.zipWithIndex.toMap)
    // null text → empty word list (split of "" is [""], filtered below),
    // never a null Seq inside the typed row
    df.select(col(idCol).as("doc_id"),
        TextOps.words(coalesce(col(textCol), lit(""))).as("ws"))
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        val r = ranks.value
        // per-partition memo: Zipf means few distinct words dominate;
        // one digest instance per partition (digest() resets it)
        val memo = scala.collection.mutable.Map.empty[String, Vector[String]]
        val md5 = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, ws) =>
          val words = ws.filter(_.nonEmpty)
          val toks = words.flatMap(w => memo.getOrElseUpdate(w, encodeWord(w, r)))
          // detok: merges only ever concatenate a word's own symbols, so
          // gluing tokens and turning `</w>` back into spaces MUST
          // reproduce the normalized text exactly (roundtrip invariant)
          val detok = toks.mkString("").replace(EndOfWord, " ").trim
          BpeDoc(id, words.length.toLong, toks.length.toLong,
            md5.digest(toks.mkString(" ").getBytes("UTF-8"))
              .map("%02x".format(_)).mkString,
            md5.digest(detok.getBytes("UTF-8"))
              .map("%02x".format(_)).mkString)
        }
      }
  }
}
