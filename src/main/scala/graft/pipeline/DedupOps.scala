package graft.pipeline

import graft.functions.GraftFunctions.murmur3Positive
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Document deduplication at corpus scale: exact, normalized-exact,
 * n-gram Jaccard, MinHash+LSH, and SimHash.
 *
 * Scale design: exact/normalized dedup is a hash aggregation (one shuffle
 * on the fingerprint, map-side partial). MinHash LSH is the 100 TB path —
 * signatures are computed per-partition with codegen'd murmur3 expressions,
 * and the only shuffle is on (band, band_hash) buckets, never all-pairs.
 * Exact n-gram Jaccard is kept for verification: it joins on shared
 * shingles and is inherently super-linear — bound its input.
 */
object DedupOps {

  /** Word n-gram shingles (distinct) of a text column; rows with fewer than
   * n words get no shingles. */
  def shingles(text: Column, n: Int): Column = {
    val ws = TextOps.words(text)
    when(size(ws) >= n,
      array_distinct(transform(sequence(lit(0), size(ws) - n), i =>
        concat_ws(" ", (0 until n).map(j => element_at(ws, i + j + 1)): _*))))
      .otherwise(array().cast("array<string>"))
  }

  /** Exact duplicate groups by md5 of the raw text: one row per group with
   * >1 member — the representative is the smallest doc id. */
  def exactDuplicates(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("fingerprint"))
      .agg(count(lit(1)).as("dup_count"), min(col(idCol)).as("representative"))
      .filter(col("dup_count") > 1)

  /** Near-exact duplicates: same, after whitespace/case/punctuation
   * normalization. */
  def normalizedDuplicates(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(TextOps.fingerprint(col(textCol)).as("fingerprint"))
      .agg(count(lit(1)).as("dup_count"), min(col(idCol)).as("representative"))
      .filter(col("dup_count") > 1)

  /**
   * Exact n-gram Jaccard similarity join: pairs of documents whose distinct
   * word-n-gram sets have Jaccard ≥ threshold. Candidate pairs are generated
   * by co-grouping on shared shingles (inverted index), so disjoint
   * documents never pair up; still quadratic within hot shingles — the
   * verification-scale oracle for the MinHash path below.
   */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double): DataFrame = {
    val sh = docs
      .select(col(idCol).as("doc"), shingles(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("set_size", size(col("sh")))
    val inv = sh.select(col("doc"), col("set_size"), explode(col("sh")).as("shingle"))
    val pairs = inv.as("a").join(inv.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"),
        col("a.set_size").as("size_a"), col("b.set_size").as("size_b"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .withColumn("jaccard",
        round(col("inter").cast("double") /
          (col("size_a") + col("size_b") - col("inter")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** MinHash signature: for each of k hash functions (murmur3 with seed i),
   * the min over the document's shingles. Computed without explode —
   * array_min over a transformed shingle array, fully codegen'd. */
  def minhashSignature(text: Column, n: Int, k: Int): Column = {
    val sh = shingles(text, n)
    array((0 until k).map { seed =>
      array_min(transform(sh, s => murmur3Positive(s, seed)))
    }: _*)
  }

  /**
   * MinHash + LSH banding: k-hash signatures split into `bands` bands of
   * k/bands rows; documents sharing any band bucket become candidate pairs,
   * then candidates are confirmed against the signature-estimated Jaccard.
   * The shuffle is |docs| × bands rows — linear, the 100 TB path.
   */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 32, bands: Int = 8, threshold: Double = 0.5): DataFrame = {
    val rows = k / bands
    val sig = docs
      .select(col(idCol).as("doc"), shingles(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0) // drop docs too short to shingle
      .select(col("doc"), array((0 until k).map { seed =>
        array_min(transform(col("sh"), s => murmur3Positive(s, seed)))
      }: _*).as("sig"))
    val banded = sig.select(col("doc"), col("sig"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)), b =>
          hash(slice(col("sig"), b * rows + 1, lit(rows))))).as(Seq("band", "band_hash")))
    val candidates = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.band_hash") === col("b.band_hash") &&
          col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .distinct()
    candidates
      .withColumn("est_jaccard",
        round(size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y),
          b => b)).cast("double") / k, 4))
      .filter(col("est_jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("est_jaccard"))
  }

  /**
   * MinHash LSH candidates confirmed with the EXACT n-gram Jaccard — the
   * standard two-stage recipe at corpus scale: LSH banding prunes the pair
   * space to near-linear, then only the candidates pay the exact set
   * intersection. With rows-per-band 2 and 32 bands the miss probability
   * for a pair at jaccard j is (1-j^2)^32 (≈1e-18 at j=0.85), so the output
   * equals [[ngramJaccardPairs]] — which is exactly what the correctness
   * oracle checks it against.
   */
  def minhashLshVerifiedPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 64, bands: Int = 32, threshold: Double = 0.5): DataFrame = {
    val rows = k / bands
    val sh = docs
      .select(col(idCol).as("doc"), shingles(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
    val sig = sh.select(col("doc"), array((0 until k).map { seed =>
      array_min(transform(col("sh"), s => murmur3Positive(s, seed)))
    }: _*).as("sig"))
    val banded = sig.select(col("doc"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)), b =>
        hash(slice(col("sig"), b * rows + 1, lit(rows))))).as(Seq("band", "band_hash")))
    val candidates = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.band_hash") === col("b.band_hash") &&
          col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
      .distinct()
    candidates
      .join(sh.select(col("doc").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(sh.select(col("doc").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard", round(col("inter").cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - col("inter")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /**
   * SimHash (b-bit): per word, murmur3 bits vote ±1 into b counters; the
   * sign vector packed into a LONG. Near-duplicates cluster at small
   * Hamming distance; equal simhash = near-dup bucket.
   */
  def simhash(text: Column, bits: Int = 16): Column = {
    val ws = TextOps.words(text)
    val weights = (0 until bits).map { b =>
      aggregate(ws, lit(0L), (acc, w) =>
        acc + when(shiftright(murmur3Positive(w, 0), b).bitwiseAND(1) === 1, 1L)
          .otherwise(-1L))
    }
    weights.zipWithIndex.map { case (wgt, b) =>
      when(wgt > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** SimHash near-dup buckets: groups of documents with identical simhash. */
  def simhashBuckets(docs: DataFrame, idCol: String, textCol: String, bits: Int = 16): DataFrame =
    docs.select(col(idCol).as("doc"), simhash(col(textCol), bits).as("simhash"))
      .groupBy(col("simhash"))
      .agg(count(lit(1)).as("bucket_size"), min(col("doc")).as("representative"),
        sort_array(collect_list(col("doc"))).as("members"))
      .filter(col("bucket_size") > 1)
}
