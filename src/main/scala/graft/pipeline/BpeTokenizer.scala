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
 *    BPE trains on the (word, count) frequency table, which is
 *    vocabulary-sized, not corpus-sized (this is also how the reference
 *    tokenizer libraries train). The merge loop itself runs on that
 *    aggregated table; its input is bounded by |vocab|, and the loop is
 *    inherently sequential (merge i+1 depends on merge i), so running it
 *    where the vocab table lands is the honest layout. A web-scale vocab
 *    (~10⁷ entries) is a few hundred MB — dimension-table sized.
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
   * End-to-end: learn merges from THIS corpus (one word-count shuffle +
   * the vocab-sized merge loop), then tokenize every document with the
   * broadcast rank table. Output digests the exact token stream per doc.
   */
  def tokenize(df: DataFrame, idCol: String, textCol: String,
      numMerges: Int): Dataset[BpeDoc] = {
    val spark = df.sparkSession
    import spark.implicits._
    val counts = df
      .select(explode(TextOps.words(col(textCol))).as("word"))
      .where(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect() // vocabulary-sized, never corpus-sized
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
