package graft

import graft.pipeline.{CorpusOps, DedupOps, TextOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** NULL/empty-text hardening: the fixtures contain no NULL text, so only
 * a dedicated spec catches the `size(null) = -1` / silent-join-drop
 * class of bug (it has produced latent divergence twice in review; see
 * p23/p24/p41 history). Every text operator must treat NULL text exactly
 * like the empty string — same row counts, no nulls leaking into keys,
 * no thrown errors. */
class NullTextSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mixed = Seq(
    (0L, null.asInstanceOf[String], "a"),
    (1L, "", "a"),
    (2L, "the quick brown fox jumps over the lazy dog", "b"),
    (3L, "   ", "b"))
    .toDF("doc_id", "text", "source")

  test("word/ngram/token operators: null == empty, no rows lost") {
    val out = mixed.select(col("doc_id"),
      TextOps.wordNGrams(col("text"), 3).as("g3"),
      coalesce(TextOps.tokenCount(col("text")), lit(1)).as("tc"),
      TextOps.fingerprint(coalesce(col("text"), lit(""))).as("fp"),
      CorpusOps.sampleKey(col("text"), col("doc_id")).as("sk"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.size === 4) // nothing dropped
    // null and empty agree on every derived value except the id-keyed hash
    assert(out(0L).getSeq[String](1) === out(1L).getSeq[String](1))
    assert(out(0L).getAs[Int]("tc") === out(1L).getAs[Int]("tc"))
    assert(out(0L).getString(3) === out(1L).getString(3))
    out.values.foreach { r =>
      assert(!r.isNullAt(1) && !r.isNullAt(3) && !r.isNullAt(4),
        s"doc ${r.getLong(0)} leaked a NULL derivation")
    }
  }

  test("dedup operators group null-text docs as empty-text duplicates") {
    // null, "", and whitespace-only all normalize to the same NON-NULL
    // fingerprint: one duplicate family with doc 0 as representative (a
    // NULL fingerprint would instead silently drop them from joins)
    val fams = DedupOps.normalizedDuplicates(mixed, "doc_id", "text")
      .collect()
    assert(fams.length === 1)
    assert(fams.head.getAs[Long]("dup_count") === 3L)
    assert(fams.head.getAs[Long]("representative") === 0L)
    assert(fams.head.getString(0) != null)
  }

  test("repeated-span scrub and BPE tokenize are total over null text") {
    val scrub = CorpusOps.repeatedSpanScrub(mixed, "doc_id", "text",
      n = 2, minCount = 2).collect().map(r => r.getLong(0) -> r).toMap
    assert(scrub.size === 4)
    assert(scrub(0L).getAs[Long]("n_words") === 0L)
    assert(scrub(0L).getAs[String]("kept_md5") ===
      "d41d8cd98f00b204e9800998ecf8427e") // md5("")
    val bpe = graft.pipeline.BpeTokenizer
      .tokenize(mixed, "doc_id", "text", numMerges = 5)
      .collect().map(b => b.doc_id -> b).toMap
    assert(bpe.size === 4)
    assert(bpe(0L).n_tokens === 0L && bpe(0L).tokens_md5 === bpe(1L).tokens_md5)
  }

  test("session-5 ops are total over null text") {
    // containment: null-text docs have no shingles → pair with nothing,
    // never crash or emit a null key
    val cont = DedupOps.containmentPairs(mixed, "doc_id", "text", 3, 0.5)
      .collect()
    // only doc 2 has shingles, so there is nothing to pair with — and
    // critically, nothing crashed and no null key leaked into the join
    assert(cont.isEmpty)
    // span corruption: null/empty/whitespace docs are excluded from the
    // plan (no positions), the real doc still plans
    val spans = CorpusOps.spanCorruptionPlan(mixed, "doc_id", "text",
      startPerMil = 1000, maxSpan = 2).collect()
    assert(spans.nonEmpty && spans.forall(_.getLong(0) === 2L))
    // dedup impact: null text fingerprints as empty (one family), token
    // counts never go to -1, ppm division is total
    val imp = CorpusOps.dedupImpact(mixed, "doc_id", "text", "source")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    // source a: docs 0 (null, rep of the empty family) and 1 ("", dup);
    // each counts ONE token (split("") = [""], the library convention)
    assert(imp("a") === ((2L, 1L, 2L, 1L, 500000L)))
    // source b: doc 2 kept (9 tokens), doc 3 whitespace-only (1 token,
    // dup of the empty family whose rep is doc 0)
    assert(imp("b") === ((2L, 1L, 10L, 9L, 900000L)))
  }

  test("session-6 ops are total over null text") {
    import graft.pipeline.Retrieval
    // BM25: a null-text query doc has no terms → retrieves nothing; a
    // null-text corpus doc has no postings → never retrieved; neither
    // crashes, and N still counts all 4 docs (verified indirectly: doc 2
    // self-query excluded, so the only possible pair is absent)
    val bm = Retrieval.bm25TopK(mixed, mixed, "doc_id", "text", k = 5)
      .collect()
    assert(bm.isEmpty) // doc 2 is the only doc with words; self excluded
    // length-bucketed batching: every doc gets a bucket (split("") = [""]
    // → 1 token, the library convention); nothing dropped, ppm total
    val plan = CorpusOps.lengthBucketedBatchPlan(mixed, "doc_id", "text",
      nBuckets = 2, batchSize = 2).collect()
    assert(plan.map(_.getAs[Long]("n_docs")).sum === 4L)
    plan.foreach(r => assert(!r.isNullAt(r.fieldIndex("waste_ppm"))))
    // pHash: null text builds the empty image exactly like "" (same
    // geometry, same all-background hash); no crash, no null hash
    val dir = graft.Scratch.freshDir("null-phash")
    mixed.withColumn("lang", lit("en"))
      .withColumn("n_chars", lit(0))
      .select("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val ph = SparkEntry.queries("p84_image_phash")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("phash")).toMap
    assert(ph.size === 4)
    assert(ph(0L) === ph(1L), "null and empty must hash identically")
    ph.values.foreach(h => assert(h != null && h.length === 16))
  }

  test("session-7 ops are total over null text") {
    // diversity: null-text docs count 1 pseudo-token (the library
    // convention); every source present, shares non-null
    val div = CorpusOps.sourceDiversity(mixed, "source", "text").collect()
    assert(div.map(_.getAs[Long]("n_docs")).sum === 4L)
    div.foreach(r => assert(!r.isNullAt(r.fieldIndex("entropy_contrib"))))
    // chunk plan: null == empty == one 1-token chunk, identical digest
    val ch = CorpusOps.chunkOverlapPlan(mixed, "doc_id", "text", 4, 3)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("chunk_len"), r.getAs[String]("chunk_md5")))
      .groupBy(_._1)
    assert(ch.keySet === Set(0L, 1L, 2L, 3L))
    assert(ch(0L).map(_._2) === ch(1L).map(_._2))
    // readability: null == empty (1 word / 1 sentence / 1 syllable)
    val rd = CorpusOps.readability(mixed, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("flesch_e3")).toMap
    assert(rd.size === 4 && rd(0L) === rd(1L))
    // overlap matrix: null-text docs contribute no grams; no crash, and
    // the only gram-bearing doc (2, source b) has no partner → empty
    assert(CorpusOps.sourceGramOverlap(mixed, "source", "text", 5)
      .collect().isEmpty)
  }

  test("session-8 ops are total over null text") {
    // prefix join: null/empty/whitespace docs yield no shingles → no
    // pairs, no crash (and no null key ever enters the posting join)
    assert(DedupOps.jaccardPrefixJoin(mixed, "doc_id", "text", 3, 500000L)
      .collect().isEmpty)
    // PMI: null-text docs contribute no tokens; the only real doc has
    // every bigram with count 1 < floor → empty, not an error
    assert(CorpusOps.pmiCollocations(mixed, "text", minCount = 5L, k = 10)
      .collect().isEmpty)
    // ...and with the floor at 1 the real doc's bigrams all surface,
    // none with null words or null pmi
    val pmi = CorpusOps.pmiCollocations(mixed, "text", minCount = 1L, k = 100)
      .collect()
    assert(pmi.nonEmpty)
    pmi.foreach { r =>
      assert(r.getAs[String]("word_a") != null &&
        r.getAs[String]("word_b") != null &&
        !r.isNullAt(r.fieldIndex("pmi")))
    }
  }

  test("session-9 ops are total over null text") {
    // p118 video frames: a NULL-text doc builds the 1-frame zero-padded
    // stream (like empty text), parses clean, zero SAD, zero cuts
    val frames = graft.queries.PipelineQueries
      .defs("p118_video_scene_cuts").fn(spark, mkDir())
    val f = frames.collect().map(r => r.getLong(0) -> r).toMap
    assert(f.size === 4)
    assert(f(0L).getAs[Int]("n_frames") === 1 &&
      f(0L).getAs[Long]("sad_total") === 0L)
    assert(f(0L).getAs[Int]("n_frames") === f(1L).getAs[Int]("n_frames"))
    // p121 AUC: null-text docs score 0 (hits 0 over ntok+1); every doc
    // keeps a row in its stratum's histogram — counts prove totality
    val auc = CorpusOps.aucAudit(
      mixed.withColumn("score",
        coalesce(graft.pipeline.TextOps.tokenCount(col("text")), lit(0))),
      col("source"), col("score"), col("doc_id") % 2 === 0)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_pos")).toMap
    assert(auc.keySet === Set("a", "b"))
  }

  /** A scratch dir holding the 4-row mixed fixture as documents.parquet,
   * so query-level defs (which read `$dir/documents.parquet`) run over
   * the NULL-text rows. Scratch.freshDir, not a raw temp dir — wiped on
   * entry, so repeated test runs never accumulate parquet dirs. */
  private def mkDir(): String = {
    val dir = graft.Scratch.freshDir("null-frames")
    mixed.withColumn("lang", lit("en"))
      .withColumn("n_chars", length(coalesce(col("text"), lit(""))))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }
}
