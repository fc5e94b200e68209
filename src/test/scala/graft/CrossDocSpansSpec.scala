package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.CorpusOps

/** P124 — cross-document exact-substring dedup (Lee et al. 2022
 * ExactSubstr). Hand fixtures pin: a single maximal span and its exact
 * token bill, separate spans on one pair, within-doc repetition
 * producing overlapping spans on DIFFERENT diagonals (where the
 * distinct-coverage bill is less than the per-span sum), the
 * fingerprint frequency cap, and the under-k exclusion. */
class CrossDocSpansSpec extends AnyFunSuite {
  import TestSpark._

  private def run(rows: Seq[(Long, String)], k: Int = 4,
      fpCap: Int = 64): Map[(Long, Long), (Long, Long, Long, Long)] = {
    import spark.implicits._
    CorpusOps.crossDocSpans(rows.toDF("doc_id", "text"), "doc_id", "text",
        k = k, fpCap = fpCap)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
  }

  test("one shared 10-token run = one maximal span billing 10 tokens") {
    val shared = (1 to 10).map(i => s"s$i").mkString(" ")
    val out = run(Seq(
      (1L, s"alpha beta $shared gamma"),
      (2L, s"$shared delta epsilon zeta")))
    // (n_spans, max_span, span_tokens_sum, dup_tokens_a)
    assert(out === Map((1L, 2L) -> ((1L, 10L, 10L, 10L))))
  }

  test("two disjoint shared runs are two spans; distinct bill is their sum") {
    val r1 = (1 to 4).map(i => s"a$i").mkString(" ")
    val r2 = (1 to 5).map(i => s"b$i").mkString(" ")
    val out = run(Seq(
      (1L, s"$r1 filler1 filler2 filler3 filler4 $r2"),
      (2L, s"$r2 other1 other2 other3 other4 $r1")))
    assert(out === Map((1L, 2L) -> ((2L, 5L, 9L, 9L))))
  }

  test("within-doc repetition: overlapping diagonals bill distinct once") {
    val phrase = (1 to 6).map(i => s"p$i").mkString(" ")
    // doc 1 contains the phrase twice; doc 2 once → two diagonals, two
    // spans of 6, but only 12 distinct covered positions in doc 1
    val out = run(Seq(
      (1L, s"$phrase mid1 mid2 $phrase"),
      (2L, s"lead1 lead2 $phrase tail1")))
    assert(out === Map((1L, 2L) -> ((2L, 6L, 12L, 12L))))
    // and the symmetric shape: doc_a has it once, doc_b twice — the
    // doc_a coverage is then 6, below the 12-token span sum
    val out2 = run(Seq(
      (1L, s"lead1 lead2 $phrase tail1"),
      (2L, s"$phrase mid1 mid2 $phrase")))
    assert(out2 === Map((1L, 2L) -> ((2L, 6L, 12L, 6L))))
  }

  test("fingerprint cap drops boilerplate grams") {
    val boiler = (1 to 4).map(i => s"c$i").mkString(" ")
    val docs = (1L to 6L).map(i => (i, s"$boiler unique$i"))
    // cap 5 < 6 occurrences → no pairs at all
    assert(run(docs, fpCap = 5) === Map.empty)
    // raising the cap restores the 15 pairs
    assert(run(docs, fpCap = 6).size === 15)
  }

  test("documents below k tokens never pair") {
    val out = run(Seq((1L, "x1 x2 x3"), (2L, "x1 x2 x3")), k = 4)
    assert(out === Map.empty)
  }

  private def runScrub(rows: Seq[(Long, String)], k: Int = 4,
      fpCap: Int = 64): Map[Long, (Long, Long, Long, String)] = {
    import spark.implicits._
    CorpusOps.crossDocScrub(rows.toDF("doc_id", "text"), "doc_id", "text",
        k = k, fpCap = fpCap)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap
  }

  private def md5Of(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  test("scrub removes the copier's span, keeps the source intact") {
    val shared = (1 to 6).map(i => s"s$i").mkString(" ")
    val out = runScrub(Seq(
      (1L, s"alpha beta $shared"),
      (2L, s"$shared gamma delta epsilon")))
    // doc 1 (the source) untouched; doc 2 loses the 6 shared tokens
    assert(out(1L) === ((8L, 0L, 8L, md5Of(s"alpha beta $shared"))))
    assert(out(2L) === ((9L, 6L, 3L, md5Of("gamma delta epsilon"))))
  }

  test("a fully-covered document drops out of the scrub output") {
    val shared = (1 to 5).map(i => s"f$i").mkString(" ")
    val out = runScrub(Seq(
      (1L, s"$shared tail1 tail2"),
      (2L, shared)))
    assert(out.contains(1L) && !out.contains(2L))
  }

  test("scrub counts reconcile with the span census coverage") {
    val rnd = new scala.util.Random(23)
    val docs = (1L to 10L).map { i =>
      (i, (1 to 30).map(_ => s"w${rnd.nextInt(6)}").mkString(" "))
    }
    val census = run(docs, k = 3, fpCap = 10000)
    val scrub = runScrub(docs, k = 3, fpCap = 10000)
    // per doc, removed tokens = |union of covered positions over all
    // lower-doc pairs| — recompute from the census side's spans via the
    // driver replay used above is overkill; instead pin the invariant
    // that every doc with any pair as doc_b removed at least min-span
    // tokens, and docs appearing only as doc_a removed none
    val asB = census.keySet.map(_._2)
    val asAOnly = census.keySet.map(_._1) -- asB
    asAOnly.foreach(a => assert(scrub(a)._2 === 0L, s"doc $a"))
    asB.foreach(b => if (scrub.contains(b))
      assert(scrub(b)._2 >= 3L, s"doc $b"))
  }

  test("matches the naive per-pair longest-common-run replay") {
    // pseudo-random small vocab corpus → frequent accidental overlaps
    val rnd = new scala.util.Random(11)
    val docs = (1L to 12L).map { i =>
      (i, (1 to 40).map(_ => s"w${rnd.nextInt(8)}").mkString(" "))
    }
    val k = 3
    val got = run(docs, k = k, fpCap = 10000)
    // driver replay: all maximal shared runs >= k via diagonal scan
    val toks = docs.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
    var want = Map.empty[(Long, Long), (Long, Long, Long, Long)]
    for (a <- docs.map(_._1); b <- docs.map(_._1) if a < b) {
      val (ta, tb) = (toks(a), toks(b))
      val spans = (for {
        diag <- -(ta.size - 1) to (tb.size - 1)
        // island scan along the diagonal
        run <- {
          val ms = (0 until ta.size).map(i =>
            (i, i + diag) match {
              case (_, j) if j >= 0 && j < tb.size => ta(i) == tb(j)
              case _ => false
            })
          val runs = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
          var s = -1
          for (i <- 0 until ms.size) {
            if (ms(i) && s < 0) s = i
            if ((!ms(i) || i == ms.size - 1) && s >= 0) {
              val e = if (ms(i)) i else i - 1
              if (e - s + 1 >= k) runs += ((s, e))
              s = -1
            }
          }
          runs.toSeq
        }
      } yield run).toSeq
      if (spans.nonEmpty) {
        val lens = spans.map { case (s, e) => (e - s + 1).toLong }
        val distinctA = spans.flatMap { case (s, e) => s to e }.distinct.size.toLong
        want += (a, b) -> ((lens.size.toLong, lens.max, lens.sum, distinctA))
      }
    }
    assert(got === want)
  }
}
