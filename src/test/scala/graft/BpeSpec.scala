package graft

import graft.pipeline.BpeTokenizer
import org.scalatest.funsuite.AnyFunSuite

/** Real BPE: the Sennrich et al. (2016) worked example must reproduce the
 * classic merge sequence and the "low est" segmentation; detokenization
 * must be exact; the distributed path must be deterministic. */
class BpeSpec extends AnyFunSuite {
  import TestSpark._

  private val sennrich = Seq(
    "low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)

  test("training reproduces the Sennrich merge sequence") {
    val merges = BpeTokenizer.trainFromCounts(sennrich, 5)
    // hand-derived with the </w> marker variant and lexicographic ties:
    // es(9) → est(9) → est</w>(9) → lo(7) → low(7)
    assert(merges === Seq(
      ("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"), ("lo", "w")))
  }

  test("apply loop segments an unseen word with learned merges") {
    val ranks = BpeTokenizer.trainFromCounts(sennrich, 5).zipWithIndex.toMap
    // the canonical result: lowest → low + est</w>
    assert(BpeTokenizer.encodeWord("lowest", ranks) ===
      Vector("low", "est</w>"))
    // training word merges fully up to the (unlearned) final </w> join
    assert(BpeTokenizer.encodeWord("low", ranks) === Vector("low", "</w>"))
  }

  test("detokenization roundtrip is exact for random words") {
    val rnd = new scala.util.Random(7)
    val words = (1 to 200).map(_ =>
      (1 to (1 + rnd.nextInt(12))).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString)
    val counts = words.groupBy(identity).map { case (w, g) => w -> g.size.toLong }.toSeq
    val ranks = BpeTokenizer.trainFromCounts(counts, 40).zipWithIndex.toMap
    words.foreach { w =>
      val toks = BpeTokenizer.encodeWord(w, ranks)
      assert(toks.mkString("") === w + BpeTokenizer.EndOfWord, s"word $w")
      assert(toks.nonEmpty)
    }
  }

  test("more merges never increase a word's token count") {
    val counts = Seq("banana" -> 4L, "bandana" -> 2L, "cabana" -> 3L)
    val all = BpeTokenizer.trainFromCounts(counts, 20)
    val lens = (0 to all.length).map { k =>
      val ranks = all.take(k).zipWithIndex.toMap
      BpeTokenizer.encodeWord("banana", ranks).length
    }
    assert(lens.zip(lens.tail).forall { case (a, b) => b <= a })
  }

  test("minCount floor prunes TRAINING distributed, never application") {
    import spark.implicits._
    // "ab" is frequent; "zz" is a hapax type whose pairs would earn
    // merges without the floor — the fixture corpora have ZERO hapax
    // types (31 types, all ≥ 2), so this corpus is where the floor
    // actually bites and the contract is pinned
    val docs = Seq((1L, "ab ab zz"), (2L, "ab")).toDF("doc_id", "text")
    def byId(minCount: Long) = BpeTokenizer
      .tokenize(docs, "doc_id", "text", numMerges = 6, minCount = minCount)
      .collect().map(d => d.doc_id -> d).toMap
    val floored = byId(2L)
    val unpruned = byId(1L)
    // the floor changes what is LEARNED: doc 1 carries the hapax, whose
    // symbols merge without the floor but stay characters with it
    assert(floored(1L).n_tokens > unpruned(1L).n_tokens)
    assert(floored(1L).tokens_md5 !== unpruned(1L).tokens_md5)
    // the hapax is still TOKENIZED (floor ≠ drop): word counts agree
    // and the detok roundtrip digest is floor-invariant
    assert(floored(1L).n_words === 3L)
    assert(floored(1L).detok_md5 === unpruned(1L).detok_md5)
    // distributed floor ≡ driver-side replay of the same contract:
    // train on the ≥ minCount slice of the full count table, encode
    val counts = Seq("ab" -> 3L) // "zz" (count 1) pruned by the floor
    val ranks = BpeTokenizer.trainFromCounts(counts, 6).zipWithIndex.toMap
    val md5 = java.security.MessageDigest.getInstance("MD5")
    val expect = Seq("ab", "ab", "zz")
      .flatMap(w => BpeTokenizer.encodeWord(w, ranks))
    assert(floored(1L).n_tokens === expect.length.toLong)
    assert(floored(1L).tokens_md5 ===
      md5.digest(expect.mkString(" ").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString)
  }

  test("maxVocabTypes refuses by name before any driver materialization") {
    import spark.implicits._
    val docs = Seq((1L, "aa bb cc dd aa bb cc dd")).toDF("doc_id", "text")
    val e = intercept[IllegalStateException] {
      BpeTokenizer.tokenize(docs, "doc_id", "text", numMerges = 5,
        minCount = 1L, maxVocabTypes = 2)
    }
    // the error names the bound and the remedy (the refuse-by-name
    // discipline: TableView maxKeys, urlCensusStream maxUrlsPerHost)
    assert(e.getMessage.contains("maxVocabTypes=2"))
    assert(e.getMessage.contains("minCount"))
    // at the bound (4 qualifying types) the same corpus trains fine
    val ok = BpeTokenizer.tokenize(docs, "doc_id", "text", numMerges = 5,
      minCount = 1L, maxVocabTypes = 4).collect()
    assert(ok.length === 1 && ok.head.n_tokens > 0L)
  }

  test("distributed tokenize: deterministic, bounded, exact digests") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def run() = BpeTokenizer.tokenize(docs, "doc_id", "text", 30)
      .collect().map(b => b.doc_id -> b).toMap
    val a = run(); val b = run()
    assert(a.size === 500)
    a.foreach { case (id, d) =>
      // every word yields ≥1 token and ≤ chars+1 tokens
      assert(d.n_tokens >= d.n_words, s"doc $id")
      assert(b(id).tokens_md5 === d.tokens_md5, s"doc $id digest")
      assert(b(id).n_tokens === d.n_tokens, s"doc $id count")
    }
    // merges actually compress: strictly fewer tokens than characters
    val driver = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val totalTokens = a.values.map(_.n_tokens).sum
    val totalChars = driver.values.map(_.count(_ != ' ').toLong).sum
    assert(totalTokens < totalChars)
    // detokenization digest equals the normalized source text's digest
    // (roundtrip invariant recomputed here without running BPE)
    val mdig = java.security.MessageDigest.getInstance("MD5")
    a.foreach { case (id, dd) =>
      val norm = driver(id).toLowerCase
        .replaceAll("[^a-z0-9]+", " ").trim
      val expect = mdig.digest(norm.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(dd.detok_md5 === expect, s"doc $id detok")
    }
  }
}
