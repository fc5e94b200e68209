package graft

import graft.pipeline.DedupOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Prefix-filtered exact Jaccard join (p109): parity against a
 * driver-side brute-force over every pair (the completeness theorem —
 * the prefix×prefix candidate join must lose NO qualifying pair), plus
 * a hand fixture where only the rare-shingle prefix can produce the
 * candidate. */
class PrefixJoinSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def norm(t: String): Seq[String] =
    t.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim.split(" ").toSeq
      .filter(_.nonEmpty)

  private def shingles(t: String, n: Int): Set[String] =
    norm(t).sliding(n).filter(_.length == n).map(_.mkString(" ")).toSet

  /** Exact integer-ppm Jaccard pairs, brute force over all doc pairs. */
  private def naive(docs: Seq[(Long, String)], n: Int,
      tPpm: Long): Map[(Long, Long), Long] = {
    val sets = docs.map { case (id, t) => id -> shingles(t, n) }
      .filter(_._2.nonEmpty)
    (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      inter = (sa & sb).size.toLong if inter > 0
      jac = inter * 1000000L / (sa.size + sb.size - inter)
      if jac >= tPpm
    } yield (a, b) -> jac).toMap
  }

  test("parity vs all-pairs brute force on a pseudo-random corpus") {
    // deterministic LCG corpus: 60 docs over a 12-word vocabulary with
    // planted near-copies so qualifying pairs actually exist
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    val rng = new Lcg(12345L)
    val base = (0 until 40).map { i =>
      i.toLong -> (0 until (8 + rng.next(10))).map(_ => vocab(rng.next(12))).mkString(" ")
    }
    val copies = (0 until 20).map { i =>
      val (_, t) = base(rng.next(40))
      (100L + i) -> (t + " " + vocab(rng.next(12))) // near-copy with a tail word
    }
    val docs = base ++ copies
    val got = DedupOps.jaccardPrefixJoin(
        docs.toDF("doc_id", "text"), "doc_id", "text", 3, 500000L)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Long]("jac_ppm")).toMap
    val want = naive(docs, 3, 500000L)
    assert(want.nonEmpty, "fixture must produce qualifying pairs")
    assert(got === want)
  }

  test("rare-shingle prefix finds the pair; sizes and ppm are exact") {
    // two docs sharing 3 of 4 shingles (jaccard 3/5 = 600000 ppm)
    val docs = Seq(
      1L -> "one two three four five six",   // shingles: 4
      2L -> "zero two three four five six")  // shares "two three four" etc.
    val rows = DedupOps.jaccardPrefixJoin(
        docs.toDF("doc_id", "text"), "doc_id", "text", 3, 500000L)
      .collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getAs[Long]("doc_a") === 1L)
    assert(r.getAs[Long]("doc_b") === 2L)
    assert(r.getAs[Long]("n_common") === 3L)
    assert(r.getAs[Long]("size_a") === 4L)
    assert(r.getAs[Long]("size_b") === 4L)
    assert(r.getAs[Long]("jac_ppm") === 600000L)
  }

  test("below-threshold pairs are absent even when candidates arise") {
    val docs = Seq(
      1L -> "one two three four ten eleven twelve thirteen",
      2L -> "one two three nine a b c d e f") // small overlap, low jaccard
    val rows = DedupOps.jaccardPrefixJoin(
        docs.toDF("doc_id", "text"), "doc_id", "text", 3, 500000L)
      .collect()
    assert(rows.isEmpty)
  }

  /** Exact integer-ppm containment pairs, brute force over all pairs:
   * (a, b) kept when either direction's |∩|/|side| reaches t. */
  private def naiveCont(docs: Seq[(Long, String)], n: Int, tPpm: Long)
      : Map[(Long, Long), (Long, Long)] = {
    val sets = docs.map { case (id, t) => id -> shingles(t, n) }
      .filter(_._2.nonEmpty)
    (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      inter = (sa & sb).size.toLong if inter > 0
      ca = inter * 1000000L / sa.size
      cb = inter * 1000000L / sb.size
      if ca >= tPpm || cb >= tPpm
    } yield (a, b) -> ((ca, cb))).toMap
  }

  test("containment join: parity vs all-pairs brute force") {
    // the p109 corpus shape PLUS planted quote inclusions: short docs
    // fully embedded in long hosts — high containment, low Jaccard
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    val rng = new Lcg(98765L)
    val base = (0 until 30).map { i =>
      i.toLong -> (0 until (10 + rng.next(10)))
        .map(_ => vocab(rng.next(12))).mkString(" ")
    }
    val quotes = (0 until 15).map { i =>
      val (_, host) = base(rng.next(30))
      val ws = host.split(" ")
      val from = rng.next(math.max(1, ws.length - 5))
      (200L + i) -> ws.slice(from, from + 5).mkString(" ") // 5-word quote
    }
    val docs = base ++ quotes
    val got = DedupOps.containmentPrefixJoin(
        docs.toDF("doc_id", "text"), "doc_id", "text", 3, 700000L)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        ((r.getAs[Long]("cont_a_ppm"), r.getAs[Long]("cont_b_ppm")))).toMap
    val want = naiveCont(docs, 3, 700000L)
    assert(want.nonEmpty, "fixture must produce qualifying pairs")
    assert(got === want)
  }

  test("containment join catches the quote Jaccard misses") {
    // a 4-word quote inside a 16-word host: containment(quote→host) = 1,
    // Jaccard ≈ 2/14 — the asymmetric measure's whole point
    val host = "w1 w2 w3 w4 w5 w6 w7 w8 quick brown fox jumps w9 w10 w11 w12"
    val docs = Seq(1L -> host, 2L -> "quick brown fox jumps")
    val rows = DedupOps.containmentPrefixJoin(
        docs.toDF("doc_id", "text"), "doc_id", "text", 3, 700000L)
      .collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getAs[Long]("doc_a") === 1L && r.getAs[Long]("doc_b") === 2L)
    assert(r.getAs[Long]("n_common") === 2L)     // both 3-grams of the quote
    assert(r.getAs[Long]("size_b") === 2L)
    assert(r.getAs[Long]("cont_b_ppm") === 1000000L) // fully contained
    assert(r.getAs[Long]("cont_a_ppm") < 700000L)    // host side far below
    // and the same pair is invisible to the Jaccard join at 0.5
    assert(DedupOps.jaccardPrefixJoin(
      docs.toDF("doc_id", "text"), "doc_id", "text", 3, 500000L)
      .collect().isEmpty)
  }

  test("containment join: below-threshold absence") {
    val docs = Seq(
      1L -> "one two three four ten eleven twelve thirteen",
      2L -> "one two three nine a b c d e f")
    assert(DedupOps.containmentPrefixJoin(
      docs.toDF("doc_id", "text"), "doc_id", "text", 3, 700000L)
      .collect().isEmpty)
  }
}
