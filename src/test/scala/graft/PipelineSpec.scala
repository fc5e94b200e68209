package graft

import graft.pipeline.{DedupOps, Similarity, TextOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The LLM-pipeline operators against the sf0.001 fixtures: the approximate
 * paths must agree with their exact formulations, and the column-expression
 * text ops must match hand-computed values. */
class PipelineSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  private lazy val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("MinHash-LSH verified pairs equal the exact Jaccard join") {
    val exact = DedupOps.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .orderBy("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val lsh = DedupOps.minhashLshVerifiedPairs(docs, "doc_id", "text", 3, 64, 32, 0.5)
      .orderBy("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(exact.nonEmpty, "fixture should contain near-duplicate pairs")
    assert(lsh.toSeq === exact.toSeq)
  }

  test("containment catches a quoted subset that Jaccard misses") {
    import TestSpark.spark
    import spark.implicits._
    val quote = "alpha beta gamma delta epsilon"
    val page = ("intro words before the quote " + quote +
      " and then a long unrelated tail " +
      (1 to 40).map(i => s"filler$i").mkString(" "))
    val d = Seq((0L, quote), (1L, page),
      (2L, "completely disjoint text here nothing shared at all"))
      .toDF("doc_id", "text")
    val cont = DedupOps.containmentPairs(d, "doc_id", "text", 3, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(5), r.getDouble(6)))
    // all 3 of the quote's 3-grams appear in the page: C(0→1) = 1.0,
    // while the reverse direction (and Jaccard) stay tiny
    assert(cont.map(c => (c._1, c._2)).toSeq === Seq((0L, 1L)))
    assert(cont.head._3 === 1.0)
    assert(cont.head._4 < 0.2)
    val jac = DedupOps.ngramJaccardPairs(d, "doc_id", "text", 3, 0.5)
    assert(jac.isEmpty, "Jaccard at 0.5 must NOT see the quoted subset")
  }

  test("containment scrub: strict drops the subset, mutual keeps min id") {
    import TestSpark.spark
    import spark.implicits._
    val quote = "alpha beta gamma delta epsilon"
    val page = "intro words before the quote " + quote +
      " and a long tail " + (1 to 30).map(i => s"filler$i").mkString(" ")
    val d = Seq(
      (0L, quote),              // strictly contained in 1 → drops
      (1L, page),               // the superset → survives
      (5L, "one two three four five six"),
      (6L, "one two three four five six"), // mutual with 5 → 6 drops
      (9L, "nothing shared with anyone here at all"))
      .toDF("doc_id", "text")
    val got = DedupOps.containmentScrub(d, "doc_id", "text", 3, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3))).sortBy(_._1)
    assert(got.toSeq === Seq((0L, 1L, 1.0, 1L), (6L, 5L, 1.0, 1L)))
  }

  test("embedding audit: bad dims, zero vectors, and Tukey-fence outliers") {
    import TestSpark.spark
    import spark.implicits._
    def vec(a: Float) = Array(a, 0f, 0f, 0f)
    val e = (Seq(
      (0, 1L, vec(0f)),              // zero vector (and a low outlier)
      (0, 8L, Array(1f, 2f, 3f)),    // wrong dimension
      (0, 9L, vec(100f))             // ssq 10000 → high outlier
    ) ++ (2L to 7L).map(i => (0, i, vec(10f))) // six at ssq 100
      ++ (10L to 13L).map(i => (1, i, vec(2f))) // clean group
    ).toDF("label", "vec_id", "embedding")
    val got = Similarity.embeddingAudit(e, "vec_id", "embedding", "label", 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7))).sortBy(_._1)
    // label 0: n=9, q1=q3=100000 mil (IQR 0, so the fences collapse to
    // the quartile itself: the zero vector is a low outlier, the 100f
    // vector a high one); label 1: uniform, nothing flagged
    assert(got.toSeq === Seq(
      ("0", 9L, 1L, 1L, 1L, 1L, 100000L, 100000L),
      ("1", 4L, 0L, 0L, 0L, 0L, 4000L, 4000L)))
  }

  test("identical word multisets share a simhash bucket") {
    import spark.implicits._
    val d = Seq((0L, "spark scan table"), (1L, "spark  SCAN table!"),
      (2L, "totally different words here")).toDF("doc_id", "text")
    val buckets = DedupOps.simhashBuckets(d, "doc_id", "text", 16).collect()
    assert(buckets.length === 1)
    assert(buckets.head.getAs[Long]("bucket_size") === 2)
    assert(buckets.head.getAs[Long]("representative") === 0L)
  }

  test("brute-force top-k matches a driver-side exact computation") {
    val e = embs.filter(col("vec_id") < 30)
    // mirror the engine's e3 convention: quantize once to integer codes,
    // exact integer dot/norm², ONE final IEEE expression, rank by
    // (sim_e3 DESC, id) — the same ranking the oracle replays
    val vecs = e.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)
        .map(x => math.floor(x.toDouble * 1000 + 0.5).toLong).toArray).toMap
    def simE3(a: Array[Long], b: Array[Long]): Long = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = a.map(x => x * x).sum
      val nb = b.map(x => x * x).sum
      math.floor(dot.toDouble / math.sqrt(na.toDouble * nb.toDouble)
        * 1000 + 0.5).toLong
    }
    val expected = (0L until 3L).map { q =>
      q -> vecs.keys.filter(_ != q).toSeq
        .map(i => (i, simE3(vecs(q), vecs(i))))
        .sortBy { case (i, s) => (-s, i) }.take(5).map(_._1)
    }.toMap
    val got = Similarity.bruteForceTopK(e.filter(col("vec_id") < 3), e, 5)
      .orderBy("query_id", "rank").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSeq).toMap
    (0L until 3L).foreach { q => assert(got(q) === expected(q), s"query $q") }
  }

  test("bucketed ANN only pairs vectors within one sign bucket") {
    val out = Similarity.bucketedAnn(embs.filter(col("vec_id") < 20), embs, 0.0, 8)
    val q = embs.withColumn("b", Similarity.signBucket(col("embedding"), 8))
      .select("vec_id", "b").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.select("query_id", "neighbor_id", "bucket").collect().foreach { r =>
      assert(q(r.getLong(0)) === r.getLong(2))
      assert(q(r.getLong(1)) === r.getLong(2))
    }
  }

  test("approximate ANN recall vs the brute-force truth") {
    // ground truth: all pairs with cosine >= 0.2 among the first 50 queries
    val truth = Similarity.thresholdJoin(embs.filter(col("vec_id") < 50), embs, 0.2)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty)
    val bucketed = Similarity.bucketedAnn(embs.filter(col("vec_id") < 50), embs, 0.2, 8)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val centroids = embs.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cembedding"))
    val ivf = Similarity.ivfAnn(embs.filter(col("vec_id") < 50), embs, centroids, 0.2, nprobe = 3)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // approximate methods must return only true pairs (no false positives —
    // every emitted pair passed the exact cosine threshold)…
    assert(bucketed.subsetOf(truth))
    assert(ivf.subsetOf(truth))
    // …and nonzero recall (axis-plane buckets are a coarse v1; IVF with
    // nprobe=1 trades recall for a 1/|centroids| scan)
    val bucketedRecall = bucketed.size.toDouble / truth.size
    val ivfRecall = ivf.size.toDouble / truth.size
    info(f"bucketed recall=$bucketedRecall%.3f ivf recall=$ivfRecall%.3f over ${truth.size} pairs")
    assert(bucketedRecall > 0.0)
    assert(ivfRecall > 0.0)
  }

  test("text ops compute hand-checked values") {
    import spark.implicits._
    val d = Seq((0L, "The quick, quick fox!")).toDF("doc_id", "text")
    val row = d.select(
      TextOps.normalized(col("text")).as("norm"),
      TextOps.tokenCount(col("text")).as("tc"),
      TextOps.tokenEstimate(col("text")).as("te"),
      TextOps.fingerprint(col("text")).as("fp")).head()
    assert(row.getAs[String]("norm") === "the quick quick fox")
    assert(row.getAs[Int]("tc") === 4)
    // alpha runs: the, quick, quick, fox = 4; symbols: ',', '!' = 2
    assert(row.getAs[Int]("te") === 6)
    assert(row.getAs[String]("fp").length === 32)
  }

  test("language ID picks the lexicon with the most stopword hits") {
    import spark.implicits._
    val d = Seq(
      (0L, "the cat is on the mat"),
      (1L, "el gato y la casa en un dia"),
      (2L, "der hund und die katze ist nicht da"),
      (3L, "xyzzy qwerty")).toDF("doc_id", "text")
    val out = d.select(col("doc_id"), TextOps.languageId(col("text")).as("lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(0L -> "en", 1L -> "es", 2L -> "de", 3L -> "und"))
  }

  test("dup clusters: min-label propagation finds connected components") {
    import spark.implicits._
    // chain 1-2-3-4 (diameter forces >1 iteration), triangle 10-11-12
    // (+ redundant edge), isolated pair 20-21
    val edges = Seq(
      (2L, 1L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)).toDF("doc_a", "doc_b")
    val out = DedupOps.dupClusters(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(out.toSeq === Seq((1L, 4L, 4L), (10L, 3L, 12L), (20L, 2L, 21L)))
    // distributed superstep path (forced past the union-find cutover)
    // emits the identical rows
    val big = DedupOps.dupClusters(edges, localMaxEdges = 0L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(big.toSeq === out.toSeq)
  }

  test("product quantization picks the argmin codeword per segment") {
    import spark.implicits._
    // dim 4, m=2 segments × dsub=2; codebook: 2 codewords per segment
    val corpus = Seq(
      (0L, Array(1f, 0f, 0f, 1f)),
      (1L, Array(0f, 1f, 1f, 0f)),
      (2L, Array(0.9f, 0.1f, 0.2f, 0.8f))).toDF("vec_id", "embedding")
    val codebooks = Seq(
      (0, 0, Array(1f, 0f)), (0, 1, Array(0f, 1f)),
      (1, 0, Array(0f, 1f)), (1, 1, Array(1f, 0f)))
      .toDF("segment", "code", "subvec")
    val got = Similarity.pqQuantize(corpus, codebooks, dsub = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2))).toMap
    assert(got(0L)._1 === "0,0") // (1,0)→code0 seg0; (0,1)→code0 seg1
    assert(got(1L)._1 === "1,1")
    assert(got(2L)._1 === "0,0")
    assert(got(0L)._2 === 0L) // exact codewords: zero reconstruction error
    assert(got(1L)._2 === 0L)
    // vec 2: (0.9-1)²+(0.1-0)² + (0.2-0)²+(0.8-1)² = 0.02+0.08 = 0.1
    // → err_e6 ≈ 100000 (±2 for the float32 inputs' e6 quantization)
    assert(math.abs(got(2L)._2 - 100000L) <= 2L)
  }

  test("hash embedding: signed counts land on murmur3-derived dims") {
    import spark.implicits._
    val d = Seq((0L, "spark spark table"), (1L, ""), (2L, "spark")).toDF("doc_id", "text")
    val got = TextOps.hashEmbedding(d, "doc_id", "text", dim = 64)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    def hp(w: String) = graft.functions.Murmur3x86
      .positive(w.getBytes("UTF-8"), 0).toLong
    def hs(w: String) = graft.functions.Murmur3x86
      .positive(w.getBytes("UTF-8"), 1).toLong
    def entry(w: String, c: Long) = {
      (hp(w) % 64) -> (if (hs(w) % 2 == 0) c else -c)
    }
    val exp0 = Seq(entry("spark", 2L), entry("table", 1L))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
      .filter(_._2 != 0).toSeq.sortBy(_._1)
    assert(got(0L)._1 === exp0.size.toLong)
    assert(got(0L)._2 === exp0.map(e => math.abs(e._2)).sum)
    assert(got(0L)._3 === exp0.map { case (k, v) => s"$k:$v" }.mkString(","))
    assert(!got.contains(1L)) // wordless doc has no embedding row
    assert(got(2L)._1 === 1L && got(2L)._2 === 1L)
  }

  test("IVF append census: growth PPM and the needs_split flag by hand") {
    import spark.implicits._
    // two orthogonal centroids with UNEQUAL bases (2 vs 8): the batch
    // sends 4 to cell 0 (growth 2.0 > 2× the corpus rate 5/10) and 1 to
    // cell 10 (growth 0.125) → only cell 0 flags needs_split
    val c0 = Array(1f, 0f, 0f, 0f)
    val c1 = Array(0f, 0f, 1f, 0f)
    def near(c: Array[Float], eps: Float) =
      c.map(v => if (v == 0f) eps else v)
    val c2 = Array(0f, 1f, 0f, 0f)
    val base = Seq((0L, c0), (1L, near(c0, 0.01f))) ++
      (10L until 18L).map(i => (i, near(c1, 0.001f * (i - 9))))
    val batch = Seq((100L, near(c0, 0.02f)), (101L, near(c0, 0.03f)),
      (102L, near(c0, 0.04f)), (103L, near(c0, 0.05f)),
      (110L, near(c1, 0.02f)), (120L, near(c2, 0.02f)))
    // centroid 20 was trained EXTERNALLY — no base member lands there
    val cents = Seq((0L, c0), (10L, c1), (20L, c2))
      .toDF("centroid_id", "cembedding")
    val got = Similarity.ivfAppendCensus(
      base.toDF("vec_id", "embedding"), batch.toDF("vec_id", "embedding"),
      cents)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4)))).toMap
    // cell 0: 4·Σbase(10) > 2·Σnew(6)·n_base(2) ⇔ 40 > 24 → split
    assert(got(0L) === ((2L, 4L, 2000000L, true)))
    // cell 10: 1·10 > 2·6·8 ⇔ 10 > 96 → no split
    assert(got(10L) === ((8L, 1L, 125000L, false)))
    // the batch-only orphan cell keeps its row: n_base 0, growth NULL,
    // and any membership at all flags the rebalance (1·10 > 0)
    assert(got(20L) === ((0L, 1L, -1L, true)))
  }

  test("SQ8 recall audit: lossless when codes separate, and the exact " +
      "within-step collision that costs recall") {
    import spark.implicits._
    // calibration range [0, 2550] per dim → step 10: candidates 3 and 4
    // apart by <1 step share a code, so the code ranking tie-breaks to
    // the SMALLER id — which is the WRONG neighbor here by construction
    val vs = Seq(
      (0L, Array(0f, 0f)),       // the query
      (1L, Array(4f, 0f)),       // true L2 dist 16 — but code (0,0)
      (2L, Array(3f, 0f)),       // true nearest (dist 9) — code (0,0) too
      (3L, Array(2550f, 2550f))) // spans the calibration range
      .toDF("vec_id", "embedding")
    val got = Similarity.sq8RecallAudit(vs, queryMax = 1L, k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // code dists tie at 0 for ids 1 and 2 → id 1 ranks first → miss
    assert(got.toSeq === Seq((0L, 0L, 0L)))
    // move the true nearest a full step away: codes now separate and
    // the code ranking recovers the exact neighbor
    val vs2 = Seq(
      (0L, Array(0f, 0f)),
      (1L, Array(40f, 0f)),
      (2L, Array(15f, 0f)),      // code 2 vs code 4 — separated
      (3L, Array(2550f, 2550f)))
      .toDF("vec_id", "embedding")
    val got2 = Similarity.sq8RecallAudit(vs2, queryMax = 1L, k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got2.toSeq === Seq((0L, 1L, 1000000L)))
    CacheScope.releaseAll() // both audits track the codes relation
  }

  test("SQ8: corpus-trained per-dim calibration, codes, exact error") {
    import spark.implicits._
    val corpus = Seq(
      (0L, Array(0f, 1f)),
      (1L, Array(0.5f, 3f)),
      (2L, Array(1f, 5f))).toDF("vec_id", "embedding")
    val got = Similarity.sq8Quantize(corpus)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getInt(3)))).toMap
    // driver-side replay of the declared arithmetic (same IEEE ops)
    val vs = Map(0L -> Seq(0.0, 1.0), 1L -> Seq(0.5, 3.0),
      2L -> Seq(1.0, 5.0))
    val cal = Seq((0.0, 1.0), (1.0, 5.0)) // (mn, mx) per dim
    def codes(id: Long): Seq[Int] = vs(id).zip(cal).map { case (v, (mn, mx)) =>
      math.floor((v - mn) * 255.0 / (mx - mn) + 0.5).toInt
    }
    def err(id: Long): Long = vs(id).zip(cal).zip(codes(id)).map {
      case (((v, (mn, mx)), c)) =>
        val recon = mn + c * (mx - mn) / 255.0
        math.floor((v - recon) * (v - recon) * 1e12 + 0.5).toLong
    }.sum
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // range endpoints code to 0 / 255; the midpoints to 128
    assert(codes(0L) === Seq(0, 0) && codes(2L) === Seq(255, 255))
    assert(codes(1L) === Seq(128, 128))
    for (id <- vs.keys) {
      assert(got(id)._1 === md5hex(codes(id).mkString(",")), s"vec $id codes")
      assert(got(id)._2 === err(id), s"vec $id err")
      assert(got(id)._3 === codes(id).max, s"vec $id max_code")
    }
    // endpoints reconstruct exactly: zero error at both extremes
    assert(got(0L)._2 === 0L && got(2L)._2 === 0L)
  }

  test("ADC distances are sums of per-segment LUT lookups") {
    import spark.implicits._
    val corpus = Seq(
      (0L, Array(1f, 0f, 0f, 1f)),
      (1L, Array(0f, 1f, 1f, 0f)),
      (2L, Array(0.9f, 0.1f, 0.2f, 0.8f))).toDF("vec_id", "embedding")
    val codebooks = Seq(
      (0, 0, Array(1f, 0f)), (0, 1, Array(0f, 1f)),
      (1, 0, Array(0f, 1f)), (1, 1, Array(1f, 0f)))
      .toDF("segment", "code", "subvec")
    val got = Similarity.pqAdcTopK(corpus.filter(col("vec_id") === 2),
      corpus, codebooks, dsub = 2, k = 2)
      .collect().map(r => r.getInt(1) -> (r.getLong(2), r.getLong(3))).toMap
    // vec0 codes (0,0): lut = l2((.9,.1),(1,0)) + l2((.2,.8),(0,1)) =
    // 0.02+0.08 → adc_e6 ≈ 100000 (±2 for float32 e6 quantization)
    assert(got(1)._1 === 0L && math.abs(got(1)._2 - 100000L) <= 2L)
    // vec1 codes (1,1): 1.62 + 1.28 → ≈ 2900000
    assert(got(2)._1 === 1L && math.abs(got(2)._2 - 2900000L) <= 2L)
  }

  test("semantic dedup matches a driver-side brute-force replay") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val centroids = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cembedding"))
    val got = Similarity.semanticDedup(e, centroids, threshold = 0.3)
      .collect().map(r => r.getLong(0) -> r).toMap

    // driver-side replay of the INTEGER pipeline end to end: quantize
    // once to e3 codes, assignment = argmax integer affinity (ties to
    // the lowest centroid id — zero-norm would coalesce below any real
    // affinity, mirroring the engine), pair stage = the same simE3
    // kernel — EXACT equality, no tolerance
    val vecs = e.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    val cents = vecs.filter(_._1 % 50 == 0)
    val codes = vecs.map { case (id, v) =>
      id -> v.map(x => math.floor(x * 1000 + 0.5).toLong) }.toMap
    val nsq = codes.map { case (id, c) => id -> c.map(x => x * x).sum }
    def simE3(a: Long, b: Long): Long = {
      if (nsq(a) == 0L || nsq(b) == 0L) Long.MinValue
      else {
        val dot = codes(a).zip(codes(b)).map { case (x, y) => x * y }.sum
        math.floor(dot.toDouble / math.sqrt(nsq(a).toDouble * nsq(b).toDouble)
          * 1000 + 0.5).toLong
      }
    }
    val assign = vecs.map { case (id, _) =>
      id -> cents.map { case (cid, _) => (cid, simE3(id, cid)) }
        .minBy { case (cid, aff) => (-aff, cid) }._1
    }.toMap
    val byCluster = vecs.groupBy { case (id, _) => assign(id) }
    vecs.foreach { case (id, _) =>
      val mates = byCluster(assign(id)).filter(_._1 < id)
      // the MinValue sentinel serves the assignment argmax only — the
      // engine filters cosine-undefined (zero-norm) pairs out with
      // isNotNull before aggregating, so the expectation must too
      val maxPrior = mates.map { case (mid, _) => simE3(id, mid) }
        .filter(_ != Long.MinValue).maxOption
      val row = got(id)
      assert(row.getAs[Long]("cluster") === assign(id), s"vec $id cluster")
      assert(row.getAs[Boolean]("dropped") === maxPrior.exists(_ >= 300L),
        s"vec $id dropped")
      maxPrior match {
        case Some(m) =>
          assert(row.getAs[Double]("max_prior_sim") === m.toDouble / 1000,
            s"vec $id max_prior_sim")
        case None =>
          assert(row.isNullAt(row.fieldIndex("max_prior_sim")), s"vec $id null")
      }
    }
    // every cluster's lowest-id member survives
    assert(got.values.forall(r => !r.getAs[Boolean]("dropped") ||
      r.getAs[Double]("max_prior_sim") >= 0.3))
  }

  test("hnsw appendAudit: census matches the batch, recall bounded") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val centroids = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("centroid_id"),
        col("embedding").as("cembedding"))
    val rows = graft.pipeline.Hnsw.appendAudit(e, centroids,
      batch = col("vec_id") % 10 === 5, queryMax = 20L,
      m = 16, ef = 128, k = 5, maxLevel = 2, beamSteps = 4,
      cellAdj = 8, hopsPerLevel = 1).collect()
    assert(rows.length === 20)
    val expectedBatch = e.filter(col("vec_id") % 10 === 5).count()
    // census columns are genuinely constant across query rows
    assert(rows.map(_.getAs[Long]("n_new_nodes")).distinct.toSeq ===
      Seq(expectedBatch))
    assert(rows.map(_.getAs[Long]("n_appended_edges")).distinct.length === 1)
    assert(rows.map(_.getAs[Long]("n_capped_lists")).distinct.length === 1)
    // every new node got SOME out-edges (each level-0 node selects
    // top-16 among base candidates, and cells are never empty here)
    assert(rows.head.getAs[Long]("n_appended_edges") >=
      2 * 16 * expectedBatch)
    // the appended graph still finds most exact neighbors: the batch
    // is 10%, the base graph is frozen, so recall can dip — but a walk
    // that lost the batch entirely would floor near 0.9·k div k
    val recalls = rows.map(_.getAs[Long]("recall_ppm"))
    assert(recalls.forall(r => r >= 600000L && r <= 1000000L),
      s"recalls ${recalls.toSeq}")
    graft.CacheScope.releaseAll()
  }

  test("ivfpqTopK: candidates come only from probed cells, ranked sanely") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val centroids = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("centroid_id"),
        col("embedding").as("cembedding"))
    val cb = {
      // same deterministic stand-in as the p35/p37 fixture codebooks
      val ranked = e.filter(col("vec_id") % 50 === 0)
        .withColumn("code", (row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(col("vec_id"))) - 1)
          .cast("int"))
        .filter(col("code") < 16)
      val segs = spark.range(0, 4).select(col("id").cast("int").as("segment"))
      ranked.crossJoin(segs)
        .select(col("segment"), col("code"),
          slice(col("embedding"), col("segment") * 16 + lit(1), lit(16))
            .as("subvec"))
    }
    val queries = e.filter(col("vec_id") < 10)
    val out = Similarity.ivfpqTopK(queries, e, centroids, cb,
      dsub = 16, k = 5, nprobe = 2).collect()
    assert(out.nonEmpty)
    // each query emits at most k ranked rows, ranks 1..n, asc adc
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getInt(1))
      assert(sorted.length <= 5)
      assert(sorted.map(_.getInt(1)).toSeq === (1 to sorted.length))
      assert(sorted.map(_.getLong(4)).toSeq ==
        sorted.map(_.getLong(4)).sortBy(identity).toSeq)
    }
    // every neighbor's cell is one of its query's nprobe probed cells
    val probes = Similarity.ivfProbes(queries, centroids, nprobe = 2)
      .select(col("vec_id"), col("cluster")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    out.foreach { r =>
      assert(probes(r.getLong(0)).contains(r.getLong(3)),
        s"query ${r.getLong(0)} neighbor from unprobed cell ${r.getLong(3)}")
    }
    // no self matches
    assert(out.forall(r => r.getLong(0) != r.getLong(2)))
    graft.CacheScope.releaseAll()
  }

  test("minhashAppendVerdicts: billing rules on a constructed batch") {
    import TestSpark.spark
    import spark.implicits._
    // base 10/20/30; batch 15/25/35 (batch = id % 10 == 5):
    //  15 == dup of base 10 (identical text)
    //  25 == dup of batch 15 AND base 10 -> dup_of = min = 10, both counts
    //  35 == unique -> survives
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    val b = "one two three four five six seven eight nine"
    val rows = Seq((10L, a), (20L, b), (30L, "x y z w v u t s r q"),
      (15L, a), (25L, a), (35L, "totally different words here apple pear"))
    val got = graft.pipeline.DedupOps.minhashAppendVerdicts(
      rows.toDF("doc_id", "text"), "doc_id", "text",
      batch = col("doc_id") % 10 === 5)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got.keySet === Set(15L, 25L, 35L))
    assert(got(15L).getAs[Long]("n_base_dups") === 1L &&
      got(15L).getAs[Long]("dup_of") === 10L &&
      got(15L).getAs[Boolean]("dropped"))
    assert(got(25L).getAs[Long]("n_base_dups") === 1L &&
      got(25L).getAs[Long]("n_prior_batch_dups") === 1L &&
      got(25L).getAs[Long]("dup_of") === 10L)
    assert(got(35L).getAs[Long]("n_base_dups") === 0L &&
      !got(35L).getAs[Boolean]("dropped") &&
      got(35L).isNullAt(got(35L).fieldIndex("dup_of")))
    graft.CacheScope.releaseAll()
  }

  test("scaledPlanes: axis regime to the 2^16 cap, hyperplane widths past it") {
    val S = Similarity
    assert(S.scaledPlanes(1000L) === ((8, false)))
    assert(S.scaledPlanes(8L << 16) === ((16, false)))      // last axis N
    assert(S.scaledPlanes((8L << 16) + 1) === ((17, true))) // first hyper N
    assert(S.scaledPlanes(8L << 20) === ((20, true)))
    assert(S.scaledPlanes(8L << 24) === ((24, true))) // last width in range
    // past the range the rule REFUSES loudly instead of silently
    // re-opening quadratic in-bucket growth at a capped width
    intercept[IllegalArgumentException](S.scaledPlanes((8L << 24) + 1))
    // density invariant: N/2^bits <= 8 everywhere in range
    for (n <- Seq(100L, 5000L, 600000L, 40000000L)) {
      val (b, _) = S.scaledPlanes(n)
      assert(n <= (8L << b), s"density violated at n=$n bits=$b")
    }
  }

  test("signBucketHyperplanes: engine buckets equal an integer replay") {
    val e = embs.filter(col("vec_id") < 300)
    val bits = 18
    // the engine shape: bucket over the SAME withQ3 codes the pair
    // kernel consumes (quantize-once), never a second quantization
    val got = Similarity.withQ3(e).select(col("vec_id"),
        Similarity.signBucketHyperplanes(col("codes"), bits, 64)
          .as("bucket"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // independent driver replay of the published construction: per-dim
    // e3 quantization, ±1 coefficient from the fixed-seed Knuth mix
    // (bit 17 of the product), exact long sums, sign bits packed LSB-up
    def coef(bit: Int, d: Int): Long = {
      val x = (bit.toLong * 1000003L + d.toLong * 7919L + 982451653L) *
        2654435761L
      if (((x >>> 17) & 1L) == 0L) 1L else -1L
    }
    val want = e.collect().map { r =>
      val v = r.getSeq[Float](1).map(x =>
        math.floor(x.toDouble * 1000.0 + 0.5).toLong)
      r.getLong(0) -> (0 until bits).map { i =>
        val dot = v.indices.map(d => coef(i, d) * v(d)).sum
        if (dot >= 0L) 1L << i else 0L
      }.sum
    }.toMap
    assert(got === want)
    // the planes genuinely separate the corpus (not a constant bucket)
    assert(got.values.toSet.size > 10, s"only ${got.values.toSet.size} buckets")
    // a short (wrong-dim) code array gets a NULL bucket — it drops out
    // of the bucket equi-join instead of collapsing into bucket 0
    import TestSpark.spark
    import spark.implicits._
    val shortRow = Seq((99L, Seq(1f, 2f, 3f))).toDF("vec_id", "embedding")
    val r = Similarity.withQ3(shortRow).select(
      Similarity.signBucketHyperplanes(col("codes"), bits, 64)).head
    assert(r.isNullAt(0), "short vector must bucket to NULL")
    // a NULL element nulls every plane's dot; each bit's when(dot >= 0)
    // falls to its otherwise branch, so the bucket is 0, not NULL (the
    // unrolled form's contract, preserved by the kernel) — and a NULL
    // codes array stays a NULL bucket
    val nullElem = Seq(Tuple1(
        Seq[java.lang.Long](null) ++ (1 until 64).map(Long.box(_))))
      .toDF("codes")
      .select(Similarity.signBucketHyperplanes(col("codes"), bits, 64)).head
    assert(!nullElem.isNullAt(0) && nullElem.getLong(0) === 0L,
      "null element must bucket to 0")
    val nullArr = Seq(Tuple1[Option[Seq[Long]]](None)).toDF("codes")
      .select(Similarity.signBucketHyperplanes(col("codes"), bits, 64)).head
    assert(nullArr.isNullAt(0), "null codes must bucket to NULL")
  }

  test("ivfpqRecall: recall is exactly 1 when residuals are codebook-representable") {
    import TestSpark.spark
    import spark.implicits._
    // 12 vectors = centroid + a per-segment pattern from a 4-codeword
    // alphabet (combo = i's base-4 digits, so every vector is unique);
    // the codebook contains EXACTLY those patterns, so ADC distances
    // equal the true residual L2 (up to e6 LUT quantization, orders of
    // magnitude below the inter-candidate gaps) and the approximate
    // ranking MUST reproduce the exact one: recall@3 = 1 for every
    // query, probed == global (nprobe=1, single cell). The near-zero
    // recall p135 measures on the synthetic corpus is thus PQ
    // coarseness on structureless data, not a metric defect.
    val vecs = (0L until 12L).map { i =>
      val emb = (0 until 64).map { d =>
        val j = d / 16
        0.5f + 0.05f * ((i / math.pow(4, j).toLong) % 4)
      }
      (i, emb)
    }
    val corpus = vecs.toDF("vec_id", "embedding")
    val centroid = Seq((100L, Seq.fill(64)(0.5f)))
      .toDF("centroid_id", "cembedding")
    val books = (for (j <- 0 until 4; p <- 0 until 4)
      yield (j, p, Seq.fill(16)(0.05 * p))).toDF("segment", "code", "subvec")
    val got = Similarity.ivfpqRecall(
        corpus.filter(col("vec_id") < 3), corpus, centroid, books,
        dsub = 16, k = 3, nprobe = 1)
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("recall_ppm"), r.getAs[Long]("recall_probed_ppm"))))
      .toMap
    assert(got.keySet === Set(0L, 1L, 2L))
    got.foreach { case (q, (r, rp)) =>
      assert(r === 1000000L, s"query $q global recall $r")
      assert(rp === 1000000L, s"query $q probed recall $rp")
    }
    graft.CacheScope.releaseAll()
  }

  test("minhashAppendStep: incremental steps equal the one-shot relation") {
    import TestSpark.spark
    import spark.implicits._
    val D = graft.pipeline.DedupOps
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    val rows = Seq((10L, a), (20L, "one two three four five six seven"),
      (30L, "x y z w v u t s r q"),
      (15L, a), (25L, a), (35L, "totally different words here apple pear"))
    val df = rows.toDF("doc_id", "text")
    def snap(v: org.apache.spark.sql.DataFrame) =
      v.collect().map(r => (r.getLong(0), r.getAs[Long]("n_base_dups"),
        r.getAs[Long]("n_prior_batch_dups"),
        if (r.isNullAt(r.fieldIndex("dup_of"))) -1L
        else r.getAs[Long]("dup_of"),
        r.getAs[Boolean]("dropped"))).sortBy(_._1).toSeq
    val oneShot = snap(D.minhashAppendVerdicts(df, "doc_id", "text",
      batch = col("doc_id") % 10 === 5))
    graft.CacheScope.releaseAll()
    // production shape: frozen base index, two id-ordered micro-batches
    var idx = {
      val i = D.lshIndexOf(df.filter(col("doc_id") % 10 =!= 5),
        "doc_id", "text", isBase = true)
      D.LshIndex(i.banded.localCheckpoint(), i.sets.localCheckpoint())
    }
    val acc = Seq(Seq(15L), Seq(25L, 35L)).flatMap { ids =>
      val (v, grown) = D.minhashAppendStep(idx,
        df.filter(col("doc_id").isInCollection(ids)), "doc_id", "text")
      val out = snap(v)
      idx = D.LshIndex(grown.banded.localCheckpoint(),
        grown.sets.localCheckpoint())
      graft.CacheScope.releaseAll()
      out
    }
    assert(acc.sortBy(_._1) === oneShot)
    // the grown index carries the right provenance bits: base members
    // flagged true, appended members false
    val flags = idx.banded.select(col("doc"), col("is_base")).distinct()
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(flags === Map(10L -> true, 20L -> true, 30L -> true,
      15L -> false, 25L -> false, 35L -> false))
  }

  test("minhashAppendStep: out-of-order arrival still catches the inter-batch dup") {
    import TestSpark.spark
    import spark.implicits._
    val D = graft.pipeline.DedupOps
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    val df = Seq((10L, "one two three four five six seven"),
      (25L, a), (15L, a)).toDF("doc_id", "text")
    var idx = {
      val i = D.lshIndexOf(df.filter(col("doc_id") === 10L),
        "doc_id", "text", isBase = true)
      D.LshIndex(i.banded.localCheckpoint(), i.sets.localCheckpoint())
    }
    // batch 1 appends doc 25; batch 2 arrives OUT of id order with the
    // LOWER id 15 — the duplicate pair (15, 25) must be reported on the
    // later arrival's verdict (dup_of names the higher-id partner),
    // never silently missed
    val (v1, g1) = D.minhashAppendStep(idx, df.filter(col("doc_id") === 25L),
      "doc_id", "text")
    assert(v1.collect().map(r => (r.getLong(0),
      r.getAs[Boolean]("dropped"))).toSeq === Seq((25L, false)))
    idx = D.LshIndex(g1.banded.localCheckpoint(), g1.sets.localCheckpoint())
    graft.CacheScope.releaseAll()
    val (v2, _) = D.minhashAppendStep(idx, df.filter(col("doc_id") === 15L),
      "doc_id", "text")
    val r2 = v2.collect().map(r => (r.getLong(0),
      r.getAs[Long]("n_prior_batch_dups"), r.getAs[Long]("dup_of"),
      r.getAs[Boolean]("dropped"))).toSeq
    assert(r2 === Seq((15L, 1L, 25L, true)))
    graft.CacheScope.releaseAll()
    // and an at-least-once REDELIVERY of an indexed doc must not pair
    // with its indexed self
    val (v3, _) = D.minhashAppendStep(idx, df.filter(col("doc_id") === 25L),
      "doc_id", "text")
    val r3 = v3.collect().map(r => (r.getLong(0),
      r.getAs[Boolean]("dropped"))).toSeq
    assert(r3 === Seq((25L, false)))
    graft.CacheScope.releaseAll()
  }

  test("kmeans step: cluster means exact on a two-pole fixture") {
    import TestSpark.spark
    import spark.implicits._
    // two tight groups around opposite poles; centroid seeds 0 and 3 sit
    // one in each group, so assignment is unambiguous
    val vs: Seq[(Long, Seq[Float])] = Seq(
      0L -> Seq(1f, 0f, 0f, 0f),
      1L -> Seq(0.9f, 0.1f, 0f, 0f),
      2L -> Seq(0.8f, 0.2f, 0f, 0f),
      3L -> Seq(0f, 0f, 1f, 0f),
      4L -> Seq(0f, 0f, 0.9f, 0.1f))
    val e = vs.toDF("vec_id", "embedding")
    val cents = e.filter(col("vec_id").isin(0L, 3L))
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cembedding"))
    val got = graft.pipeline.Similarity.kmeansStep(e, cents)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    def mean(ids: Seq[Long], pos: Int): Double = {
      // the engine's exact-integer path: e4 quantize, integer sum, one
      // IEEE division by size·10⁴
      val sE4 = ids.map(id => math.floor(vs.find(_._1 == id).get
        ._2(pos - 1).toDouble * 10000.0 + 0.5).toLong).sum
      sE4.toDouble / (ids.size * 10000.0)
    }
    for (pos <- 1 to 4) {
      assert(got((0L, pos)) === ((3L, mean(Seq(0L, 1L, 2L), pos))), s"c0 pos=$pos")
      assert(got((3L, pos)) === ((2L, mean(Seq(3L, 4L), pos))), s"c3 pos=$pos")
    }
  }

  test("JL projection preserves norms within the expected band") {
    import TestSpark.spark
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val inNorm = e.collect().map { r =>
      r.getLong(0) -> math.sqrt(
        r.getSeq[Float](1).map(v => v.toDouble * v).sum)
    }.toMap
    val proj = graft.pipeline.Similarity
      .randomProjection(e, dimIn = 64, dimOut = 16)
      .collect().groupBy(_.getLong(0))
      .map { case (id, rows) =>
        id -> math.sqrt(rows.map(r => {
          val p = r.getAs[Double]("proj"); p * p }).sum)
      }
    assert(proj.size === inNorm.size)
    // E[||proj||²] = ||v||²; k=16 gives ~1/√8 ≈ 35% std on the SQUARED
    // norm — individual ratios stay in a generous band, the mean tight
    val ratios = proj.map { case (id, n) => n / inNorm(id) }.toSeq
    assert(ratios.forall(r => r > 0.3 && r < 2.2),
      s"worst ratios: ${ratios.min} / ${ratios.max}")
    val meanSq = ratios.map(r => r * r).sum / ratios.size
    assert(meanSq > 0.8 && meanSq < 1.25, s"mean squared ratio $meanSq")
  }

  test("kNN graph matches a driver-side per-cluster brute force") {
    val e = embs.filter(col("vec_id") < 200)
    val cents = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cembedding"))
    val vecs = e.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val cids = vecs.keys.filter(_ % 50 == 0).toSeq.sorted
    // driver-side replay of the INTEGER pipeline: e3 codes quantized
    // once, assignment = argmax integer affinity (ties to lowest
    // centroid id), pair sims the same simE3 kernel
    val codes = vecs.map { case (id, v) =>
      id -> v.map(x => math.floor(x * 1000 + 0.5).toLong) }
    val nsq = codes.map { case (id, c) => id -> c.map(x => x * x).sum }
    def simE3(a: Long, b: Long): Long = {
      if (nsq(a) == 0L || nsq(b) == 0L) Long.MinValue
      else {
        val dot = codes(a).zip(codes(b)).map { case (x, y) => x * y }.sum
        math.floor(dot.toDouble / math.sqrt(nsq(a).toDouble * nsq(b).toDouble)
          * 1000 + 0.5).toLong
      }
    }
    val asg = vecs.map { case (id, _) =>
      id -> cids.map(c => c -> simE3(id, c)).maxBy { case (c, a) => (a, -c) }._1
    }
    val expect = vecs.keys.flatMap { id =>
      val mates = asg.collect { case (o, c) if c == asg(id) && o != id => o }
      mates.toSeq
        .map(o => (o, simE3(id, o)))
        // sentinel = cosine-undefined; the engine drops those pairs
        // (isNotNull) before its top-k, so they must not rank here
        .filter { case (_, s) => s != Long.MinValue }
        .sortBy { case (o, s) => (-s, o) }.take(3).zipWithIndex
        .map { case ((o, s), i) => (id, i + 1L, o, s.toDouble / 1000) }
    }.toSet
    val got = graft.pipeline.Similarity.knnGraph(e, cents, k = 3).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("sim"))).toSet
    assert(got === expect)
  }

  test("mutual-kNN components: reciprocity gates edges, components exact") {
    import spark.implicits._
    // hand-built geometry in 4-d: {0,1,2} a tight clique, {3,4} a tight
    // pair, 5 a hub-ish outlier that points INTO the clique but is nobody's
    // reciprocated neighbor at the threshold; 6 orthogonal singleton
    val vs = Seq(
      0L -> Seq(1f, 0.00f, 0f, 0f),
      1L -> Seq(1f, 0.05f, 0f, 0f),
      2L -> Seq(1f, 0.10f, 0f, 0f),
      3L -> Seq(0f, 1f, 0.00f, 0f),
      4L -> Seq(0f, 1f, 0.05f, 0f),
      5L -> Seq(1f, 0.30f, 0f, 0f),
      6L -> Seq(0f, 0f, 0f, 1f))
    val e = vs.toDF("vec_id", "embedding")
    // one centroid → everything shares a cell: the test isolates the
    // mutuality + components logic from the IVF assignment
    val cents = e.filter(col("vec_id") === 0L)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cembedding"))
    val got = graft.pipeline.Similarity
      .mutualKnnComponents(e, cents, k = 2, minSim = 0.9)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // k=2 at ≥0.9: clique {0,1,2} all reciprocate; {3,4} reciprocate;
    // 5's top-2 ARE clique members 2 and 1 (cos≈0.98/0.97, above the
    // threshold) but their own top-2 lists hold closer clique-mates →
    // no reciprocation → the hub stays a singleton
    assert(got === Map(0L -> 0L, 1L -> 0L, 2L -> 0L,
      3L -> 3L, 4L -> 3L, 5L -> 5L, 6L -> 6L))
  }

  test("kNN label purity flags a mislabeled point inside a pure cluster") {
    import spark.implicits._
    // two tight clusters of 4; vec 3 sits in cluster A but carries label B
    val a = Seq(0f, 1f, 2f, 3f).zipWithIndex.map { case (eps, i) =>
      (i.toLong, Seq(1f, eps * 0.01f, 0f, 0f), if (i == 3) 1 else 0)
    }
    val b = Seq(0f, 1f, 2f, 3f).zipWithIndex.map { case (eps, i) =>
      ((i + 4).toLong, Seq(0f, 0f, 1f, eps * 0.01f), 1)
    }
    val e = (a ++ b).toDF("vec_id", "embedding", "label")
    val cents = e.filter(col("vec_id").isin(0L, 4L))
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cembedding"))
    val got = graft.pipeline.Similarity.knnLabelPurity(e, cents, k = 3, minFrac = 0.5)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("k_eff"), r.getAs[Long]("same_n"),
          r.getAs[Int]("majority_label"), r.getAs[Boolean]("suspect")))).toMap
    assert(got.size === 8)
    // the mislabeled point: 3 same-cluster neighbors, all label 0 → its
    // own label 1 gets zero votes, majority 0, suspect
    assert(got(3L) === ((3L, 0L, 0, true)))
    // its cluster-mates see ONE bad vote out of 3 → still majority 0,
    // frac 2/3 ≥ 0.5 → clean
    Seq(0L, 1L, 2L).foreach(i => assert(got(i) === ((3L, 2L, 0, false)), s"vec $i"))
    // cluster B is untouched: 3/3 agreement everywhere
    Seq(4L, 5L, 6L, 7L).foreach(i => assert(got(i) === ((3L, 3L, 1, false)), s"vec $i"))
  }

  test("hard negatives: label gate prunes same-label mates, ranks by cosine") {
    import spark.implicits._
    // cluster A: 0,1,2 labeled 0 and 3 labeled 1; cluster B: 4-7 all
    // labeled 1 (no in-cell label diversity → zero negative rows)
    val a = Seq(0f, 1f, 2f, 3f).zipWithIndex.map { case (eps, i) =>
      (i.toLong, Seq(1f, eps * 0.01f, 0f, 0f), if (i == 3) 1 else 0)
    }
    val b = Seq(0f, 1f, 2f, 3f).zipWithIndex.map { case (eps, i) =>
      ((i + 4).toLong, Seq(0f, 0f, 1f, eps * 0.01f), 1)
    }
    val e = (a ++ b).toDF("vec_id", "embedding", "label")
    val cents = e.filter(col("vec_id").isin(0L, 4L))
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cembedding"))
    val got = graft.pipeline.Similarity.hardNegatives(e, cents, k = 2)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("neg_id"), r.getAs[Int]("neg_label")))
    // cell A is the only mixed-label cell: 0/1/2 each get exactly one
    // negative (vec 3); vec 3 gets its top-2 of {0,1,2} — at 3-dp
    // rounding all three cosines collapse to 1.000, so the repo's id
    // tie-break selects negatives 0 then 1
    val byVec = got.groupBy(_._1)
    assert(got.length === 5)
    Seq(0L, 1L, 2L).foreach { v =>
      assert(byVec(v).map(t => (t._2, t._3, t._4)).toSeq === Seq((1L, 3L, 1)), s"vec $v")
    }
    assert(byVec(3L).sortBy(_._2).map(t => (t._2, t._3, t._4)).toSeq ===
      Seq((1L, 0L, 0), (2L, 1L, 0)))
    assert(!got.exists(t => t._1 >= 4L))
  }

  test("IVF ANN recall vs brute force is measured, not guessed") {
    import TestSpark.spark
    import org.apache.spark.sql.functions._
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = e.filter(col("vec_id") < 20)
    val centroids = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cembedding"))
    // ground truth: brute-force neighbors above the same threshold
    val truth = graft.pipeline.Similarity
      .thresholdJoin(queries, e, threshold = 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = graft.pipeline.Similarity
      .ivfAnn(queries, e, centroids, threshold = 0.2, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // IVF must never invent a pair (its candidates are exact-scored) —
    // recall itself is measured by the sibling "approximate ANN recall"
    // test; this pins the SOUNDNESS half of the contract
    assert(ivf.subsetOf(truth), s"false positives: ${ivf -- truth}")
    val recall = ivf.size.toDouble / truth.size
    assert(truth.nonEmpty && recall >= 0.4, s"recall $recall (${ivf.size}/${truth.size})")
  }

  test("semanticContamination: verdicts, argmax tie-break, threshold edge") {
    import TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val bench = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(0f, 1f, 0f, 0f))).toDF("vec_id", "embedding")
    val corpus = Seq(
      (20L, Array(2f, 0f, 0f, 0f)),  // parallel to b0: sim 1.0, dropped
      (21L, Array(1f, 1f, 0f, 0f)),  // .707 to BOTH: tie -> smaller id 0
      (22L, Array(-3f, 0f, 0f, 0f)), // -1 to b0, 0 to b1: max 0, match 1
      (23L, Array(0f, 0f, 1f, 0f))   // orthogonal: max 0, tie -> 0
    ).toDF("vec_id", "embedding")
    val got = graft.pipeline.Similarity
      .semanticContamination(corpus, bench, threshold = 0.9)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Double]("max_sim"), r.getAs[Long]("matched_bench"),
          r.getAs[Boolean]("contaminated"))).toMap
    assert(got(20L) === ((1.0, 0L, true)))
    assert(got(21L) === ((0.707, 0L, false)))
    assert(got(22L) === ((0.0, 1L, false)))
    assert(got(23L) === ((0.0, 0L, false)))
  }

  test("pHash: near-identical images land closer than unrelated ones") {
    import TestSpark.spark
    // run the declared query on a synthetic 4-doc corpus laid out like
    // the fixture: doc 0/1 near-identical (one byte differs), doc 2
    // unrelated, doc 3 = doc 0 exactly
    val dir = graft.Scratch.freshDir("phash-spec")
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val base = Array.fill(600)((32 + rnd.nextInt(90)).toChar).mkString
    val near = base.updated(300, if (base(300) == 'a') 'b' else 'a')
    val far = Array.fill(600)((32 + rnd.nextInt(90)).toChar).mkString
    // ids all ≡ 0 (mod 32) so every image shares the same width/geometry
    // — the BMP width is a function of the doc id in the declared query
    Seq((0L, base, "en", "s", base.length),
        (32L, base, "en", "s", base.length),
        (64L, near, "en", "s", near.length),
        (96L, far, "en", "s", far.length))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("p84_image_phash")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("phash")).toMap
    def ham(a: String, b: String): Int =
      java.lang.Long.bitCount(
        java.lang.Long.parseUnsignedLong(a, 16) ^
          java.lang.Long.parseUnsignedLong(b, 16))
    assert(rows(0L) === rows(32L), "identical bytes, identical hash")
    assert(ham(rows(0L), rows(64L)) < ham(rows(0L), rows(96L)),
      s"near ${ham(rows(0L), rows(64L))} !< far ${ham(rows(0L), rows(96L))}")
    // the DC position (bit 63) is excluded by construction
    rows.values.foreach(h =>
      assert(Integer.parseInt(h.substring(0, 1), 16) < 8, h))
  }

  test("covariance + PCA power iteration match a driver-side integer replay") {
    import spark.implicits._
    val raw = Seq(
      (0L, Seq(0.5f, -0.2f, 0.1f)),
      (1L, Seq(0.4f, -0.1f, 0.0f)),
      (2L, Seq(-0.5f, 0.3f, -0.2f)),
      (3L, Seq(0.1f, 0.1f, 0.3f)))
    val vecs = raw.toDF("vec_id", "embedding")
    // integer replay of the declared arithmetic
    val xs = raw.map { case (_, v) =>
      v.map(f => math.round(f.toDouble * 1000.0))
    }
    val n = xs.size.toLong
    val d = 3
    val s = (0 until d).map(i => xs.map(_(i)).sum)
    val cov = (for { i <- 0 until d; j <- i until d } yield {
      val sij = xs.map(v => v(i) * v(j)).sum
      (i, j) -> (n * sij - s(i) * s(j))
    }).toMap
    val gotCov = graft.pipeline.Similarity.covarianceUpper(vecs)
      .collect().map(r => (r.getAs[Int]("i"), r.getAs[Int]("j")) ->
        r.getAs[Long]("cov_num")).toMap
    assert(gotCov === cov)

    // power iteration replay: C div 1e6, all-ones ×1e6 start, ∞-norm
    val cfull = Array.tabulate(d, d)((i, j) =>
      cov(math.min(i, j) -> math.max(i, j)) / 1000000L)
    var v = Array.fill(d)(1000000L)
    (1 to 3).foreach { _ =>
      val w = Array.tabulate(d)(i =>
        (0 until d).map(j => cfull(i)(j) * v(j)).sum)
      val m = math.max(w.map(math.abs).max, 1L)
      v = w.map(x => x * 1000000L / m)
    }
    val gotV = graft.pipeline.Similarity
      .pcaPowerTop(graft.pipeline.Similarity.covarianceUpper(vecs))
      .collect().map(r => r.getAs[Int]("i") -> r.getAs[Long]("v_e6")).toMap
    assert(gotV === (0 until d).map(i => i -> v(i)).toMap)
    // the dominant direction must have |component| = the ∞-norm scale
    assert(gotV.values.map(math.abs).max === 1000000L)
  }

  test("margin mining matches a driver-side replay; sharp match beats hub") {
    import spark.implicits._
    // one cell (single centroid). src label 0, tgt label 1.
    // s1 has a sharp isolated match t1; s2 sits between t2/t3 (hub-ish,
    // its best cosine is barely above its neighborhood).
    val vecs = Seq(
      (0L, Seq(1f, 0f), 0), // s1
      (1L, Seq(0.6f, 0.8f), 0), // s2
      (10L, Seq(1f, 0f), 1), // t1: exact match for s1
      (11L, Seq(0.707f, 0.707f), 1),
      (12L, Seq(0.5f, 0.866f), 1)
    ).toDF("vec_id", "embedding", "label")
    val cents = vecs.filter(col("vec_id") === 0L)
      .select(col("vec_id").as("centroid_id"),
        col("embedding").as("cembedding"))
    val got = graft.pipeline.Similarity
      .marginMining(vecs, cents, srcLabel = 0, tgtLabel = 1, k = 3)
      .collect().map(r => r.getAs[Long]("src_id") ->
        (r.getAs[Long]("tgt_id"), r.getAs[Long]("c_e3"),
          r.getAs[Long]("margin_ppm"), r.getAs[Boolean]("accepted"))).toMap

    // driver-side replay of the declared integer arithmetic
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      dot / (na * nb)
    }
    val src = Seq(0L -> Seq(1f, 0f), 1L -> Seq(0.6f, 0.8f))
    val tgt = Seq(10L -> Seq(1f, 0f), 11L -> Seq(0.707f, 0.707f),
      12L -> Seq(0.5f, 0.866f))
    val pairs = for {
      (si, sv) <- src; (ti, tv) <- tgt
      c = math.round(
        BigDecimal(cos(sv, tv) * 1000)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble).toLong
      if c > 0
    } yield (si, ti, c)
    def nn(byKey: Map[Long, Seq[(Long, Long)]]): Map[Long, (Long, Long)] =
      byKey.view.mapValues { cands =>
        val top = cands.sortBy { case (id, c) => (-c, id) }.take(3)
        (top.map(_._2).sum, top.size.toLong)
      }.toMap
    val sx = nn(pairs.groupBy(_._1).view
      .mapValues(_.map(p => (p._2, p._3))).toMap)
    val sy = nn(pairs.groupBy(_._2).view
      .mapValues(_.map(p => (p._1, p._3))).toMap)
    val exp = pairs.map { case (si, ti, c) =>
      val (sxs, kx) = sx(si); val (sys, ky) = sy(ti)
      (si, ti, c, 2L * c * kx * ky * 1000000L / (sxs * ky + sys * kx))
    }.groupBy(_._1).view.mapValues(ps =>
      ps.minBy { case (_, ti, _, m) => (-m, ti) }).toMap
    exp.foreach { case (si, (_, ti, c, m)) =>
      assert(got(si) === ((ti, c, m, m >= 1000000L)), s"src $si")
    }
    // the exact match must be accepted with a strictly higher margin
    // than the hub-ish source
    assert(got(0L)._1 === 10L && got(0L)._4)
    assert(got(0L)._3 > got(1L)._3)
  }

  test("winnow pair matching: near-copies pair, boilerplate df-capped out") {
    import TestSpark.spark
    import spark.implicits._
    // 25 docs share ONE boilerplate sentence (df=25 > 20 → its
    // fingerprints are dropped); docs 100/101 are near-copies with
    // distinctive text → the only reported pair
    val boiler = "every page of this site carries the same legal footer text"
    val distinct1 = "zebra quagga okapi wandered across the misty savanna at dawn"
    val distinct2 = "zebra quagga okapi wandered across the misty savanna at dusk"
    val d = ((0L until 25L).map(i => (i, boiler)) ++
      Seq((100L, s"$boiler $distinct1"), (101L, s"$boiler $distinct2")))
      .toDF("doc_id", "text")
    val dir = Scratch.freshDir("winnow-pairs")
    d.withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
      .select("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("p100_winnow_pairs")(spark, dir).collect()
    assert(rows.length === 1, rows.mkString(","))
    val r = rows.head
    assert(r.getAs[Long]("doc_a") === 100L && r.getAs[Long]("doc_b") === 101L)
    assert(r.getAs[Long]("match_ppm") >= 500000L)
    // the boilerplate-only docs must have paired with nobody
    CacheScope.releaseAll()
  }

  test("IVF cell stats: hand-computed census; empty cell raises load") {
    import TestSpark.spark
    import spark.implicits._
    // cell A (1,0): 3 vectors incl. centroid; cell B (0,1): one; a
    // third EMPTY centroid (no corpus vector assigned) must still count
    // in the load denominator — nlist=3, uniform share is 1/3
    val vecs = Seq(
      (0L, Seq(1f, 0f)), // centroid A, its own cell
      (1L, Seq(0.9f, 0.1f)), // → A
      (2L, Seq(0.8f, -0.2f)), // → A
      (50L, Seq(0f, 1f)) // centroid B, its own cell
    ).toDF("vec_id", "embedding")
    val cents = vecs.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("centroid_id"),
        col("embedding").as("cembedding"))
      .union(Seq((99L, Seq(-1f, 0f))).toDF("centroid_id", "cembedding"))
    val got = graft.pipeline.Similarity.ivfCellStats(vecs, cents)
      .collect().map(r => r.getAs[Long]("cluster") ->
        (r.getAs[Long]("n_vecs"), r.getAs[Long]("share_ppm"),
          r.getAs[Long]("load_ppm"))).toMap
    // load = n_vecs × nlist(=3) × 1e6 / n_total(=4)
    assert(got(0L) === ((3L, 750000L, 2250000L)))
    assert(got(50L) === ((1L, 250000L, 750000L)))
    assert(!got.contains(99L)) // empty cell absent from census rows
  }

  test("IVF recall fixture: a true neighbor in a non-probed cell is missed") {
    import TestSpark.spark
    import spark.implicits._
    // query q probes only cell A at nprobe=1; its 3rd-nearest true
    // neighbor v lives in cell B → n_hit = 2 of 3, recall 666666 ppm
    val vecs = Seq(
      (0L, Seq(1f, 0.05f)), // q → cell A
      (1L, Seq(1f, -0.2f)), // w → cell A
      (2L, Seq(0.6f, 0.8f)), // v → cell B (but near q)
      (3L, Seq(1f, 0f)), // centroid A
      (4L, Seq(0f, 1f)) // centroid B
    ).toDF("vec_id", "embedding")
    val cents = vecs.filter(col("vec_id") >= 3L)
      .select(col("vec_id").as("centroid_id"),
        col("embedding").as("cembedding"))
    val q = vecs.filter(col("vec_id") === 0L)
    val exact = graft.pipeline.Similarity.bruteForceTopK(q, vecs, k = 3)
      .select(col("query_id"), col("neighbor_id"))
    val cand = graft.pipeline.Similarity
      .ivfAnn(q, vecs, cents, threshold = -1.0, nprobe = 1)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit"))
    val r = exact.join(cand, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .withColumn("recall_ppm", expr("(n_hit * 1000000) div n_exact"))
      .collect().head
    assert(r.getAs[Long]("n_exact") === 3L)
    assert(r.getAs[Long]("n_hit") === 2L)
    assert(r.getAs[Long]("recall_ppm") === 666666L)
  }

  test("pqTrainStep: hand-computed Lloyd means, empty code keeps codeword") {
    import TestSpark.spark
    import spark.implicits._
    // 4-dim "residuals", m=2 segments of dsub=2; seg0 has a third
    // codeword nothing assigns to — it must keep its value at size 0
    val rv = Seq(
      (0L, Seq(0.0, 0.0, 1.0, 1.0)),
      (1L, Seq(0.2, 0.0, 1.0, 1.0)),
      (2L, Seq(1.0, 1.0, 0.0, 0.0)),
      (3L, Seq(1.2, 1.0, 0.0, 0.0))).toDF("vec_id", "embedding")
    val init = Seq(
      (0, 0, Seq(0.0, 0.0)), (0, 1, Seq(1.0, 1.0)), (0, 2, Seq(9.0, 9.0)),
      (1, 0, Seq(1.0, 1.0)), (1, 1, Seq(0.0, 0.0)))
      .toDF("segment", "code", "subvec")
    val got = Similarity.pqTrainStep(rv, init, dsub = 2).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) ->
        ((r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(got.size === 10) // full spine: 5 codewords x 2 positions
    // seg0 code0 <- {v0, v1}: means (0.1, 0.0) via e4-integer sums
    assert(got((0, 0, 1)) === ((2L, 0.1, 0.0)))
    assert(got((0, 0, 2)) === ((2L, 0.0, 0.0)))
    // seg0 code1 <- {v2, v3}: means (1.1, 1.0)
    assert(got((0, 1, 1)) === ((2L, 1.1, 1.0)))
    assert(got((0, 1, 2)) === ((2L, 1.0, 1.0)))
    // the orphan codeword: size 0, c_new = c_old = init
    assert(got((0, 2, 1)) === ((0L, 9.0, 9.0)))
    assert(got((0, 2, 2)) === ((0L, 9.0, 9.0)))
    // seg1: v0/v1 -> code0 = [1,1] exactly; v2/v3 -> code1 = [0,0]
    assert(got((1, 0, 1)) === ((2L, 1.0, 1.0)))
    assert(got((1, 1, 1)) === ((2L, 0.0, 0.0)))
    // a second Lloyd step is a fixed point here: assignments and means
    // cannot move once each side sits on its members' mean
    val s2 = Similarity.pqTrain(rv, init, dsub = 2, iterations = 2)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) ->
        r.getDouble(4)).toMap
    assert(s2((0, 0, 1)) === 0.1 && s2((0, 1, 1)) === 1.1)
    assert(s2((0, 2, 1)) === 9.0)
    graft.CacheScope.releaseAll()
  }
}
