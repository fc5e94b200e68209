package graft

import graft.pipeline.CorpusOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand fixtures for the session-8 analytics additions: Markov
 * transition census (q36), least-squares trend slopes (q37), and
 * apriori association rules (p112). */
class EventStatsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("association rules: apriori prune excludes infrequent items") {
    // 10 docs; "a" and "b" co-occur in 4 (frequent pair), "rare" occurs
    // in 1 doc only — even though (rare, a) co-occur there, "rare"
    // fails the N/5 = 2 item floor, so no pair with it may surface
    val docs = (0L until 10L).map { i =>
      val words = Seq("filler" + i) ++
        (if (i < 4) Seq("a", "b") else if (i < 7) Seq("a") else Nil) ++
        (if (i == 0) Seq("rare") else Nil)
      (i, words.mkString(" "))
    }.toDF("doc_id", "text")
    val rules = CorpusOps.associationRules(docs, "doc_id", "text",
      supDivisor = 5L, pairDivisor = 10L, k = 50)
      .collect().map(r => (r.getAs[String]("word_a"), r.getAs[String]("word_b")) ->
        (r.getAs[Long]("sup_ab"), r.getAs[Long]("sup_a"), r.getAs[Long]("sup_b"),
          r.getAs[Long]("conf_ab_ppm"), r.getAs[Long]("lift_ppm"))).toMap
    assert(rules.keySet === Set(("a", "b")))
    // sup_a=7, sup_b=4, sup_ab=4: conf a→b = 4/7, lift = 4·10/(7·4)
    assert(rules(("a", "b")) === ((4L, 7L, 4L, 571428L, 1428571L)))
  }

  test("TWAP: duration weighting, exact numerator, zero-span NULL") {
    val dir = Scratch.freshDir("twap-events")
    Seq(
      // user 1: 2.00 held 100 ms, then 4.00 held 200 ms → twap 10/3
      (1L, new java.sql.Timestamp(0L), 1L, "A", 2.0, "{}"),
      (2L, new java.sql.Timestamp(100L), 1L, "A", 4.0, "{}"),
      (3L, new java.sql.Timestamp(300L), 1L, "A", 9.0, "{}"),
      // user 2: both events on ONE ms → span 0 → NULL twap
      (4L, new java.sql.Timestamp(500L), 2L, "A", 1.0, "{}"),
      (5L, new java.sql.Timestamp(500L), 2L, "A", 7.0, "{}"),
      // user 3: single event → no interval → absent
      (6L, new java.sql.Timestamp(900L), 3L, "A", 5.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q38_twap")(spark, dir)
      .collect().map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_intervals"), r.getAs[Long]("vms_e2"),
          r.getAs[Long]("span_ms"),
          Option(r.getAs[java.lang.Double]("twap_e2"))))).toMap
    // vms = 200·100 + 400·200 = 100000 over span 300
    assert(got(1L) === ((2L, 100000L, 300L,
      Some(math.rint(100000.0 / 300.0 * 1e6) / 1e6))))
    assert(got(2L) === ((1L, 0L, 0L, None)), "zero span must yield NULL")
    assert(!got.contains(3L), "single-event users have no interval")
  }

  test("keep-longest canonicalization: longer wins, equal lengths tie to smaller id") {
    val dir = Scratch.freshDir("keep-longest-docs")
    val base = "alpha beta gamma delta epsilon zeta eta theta"
    val other = "red orange yellow green blue indigo violet cyan magenta"
    Seq(
      // family 1: identical docs (equal tokens) → keep the SMALLER id
      (5L, base), (9L, base),
      // family 2 (disjoint vocabulary so the families cannot chain):
      // 11 is 10 plus a tail word → longer wins over smaller id
      (10L, other), (11L, other + " umber"),
      // singleton: no pair, never appears
      (2L, "completely different text with no shared shingles at all"))
      .map { case (id, t) => (id, t, "en", "web", t.length) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("p117_keep_longest")(spark, dir)
      .collect().map(r => r.getAs[Long]("cluster_rep") ->
        ((r.getAs[Long]("cluster_size"), r.getAs[Long]("keep_doc"),
          r.getAs[Long]("keep_tokens"), r.getAs[Long]("dropped_tokens")))).toMap
    CacheScope.releaseAll()
    assert(got.keySet === Set(5L, 10L))
    assert(got(5L) === ((2L, 5L, 8L, 8L)), s"tie must keep the smaller id: $got")
    assert(got(10L) === ((2L, 11L, 10L, 9L)),
      s"the longer member (10 tokens) must win over the smaller id: $got")
  }

  test("sampling table: capped ranges partition [0, T); probes resolve uniquely") {
    // counts: aa ×3, bb ×100 (capped to 5), cc ×1 → ranges over T=9:
    // aa [0,3), bb [3,8), cc [8,9)
    val docs = (Seq.fill(3)("aa") ++ Seq.fill(100)("bb") ++ Seq("cc"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val rows = graft.pipeline.CorpusOps.samplingTable(docs, "text",
      cap = 5L, nProbes = 16).collect()
    assert(rows.length === 16, "every probe resolves to exactly one word")
    val ranges = rows.map(r => r.getAs[String]("word") ->
      (r.getAs[Long]("start_range"), r.getAs[Long]("end_range"), r.getAs[Long]("wt")))
      .distinct.toMap
    assert(ranges("bb") === ((3L, 8L, 5L)), s"cap must bind: $ranges")
    assert(ranges.get("aa").forall(_ == ((0L, 3L, 3L))))
    // probes in [0, 9), and each u inside its word's range
    rows.foreach { r =>
      val (u, s, e) = (r.getAs[Long]("u"), r.getAs[Long]("start_range"),
        r.getAs[Long]("end_range"))
      assert(u >= 0 && u < 9 && s <= u && u < e)
    }
  }

  test("MAD outliers: exact lower medians; MAD=0 stratum flags any deviation") {
    // source a: values 10,12,14,20,100 → med=14, absdevs {4,2,0,6,86} →
    // sorted {0,2,4,6,86} → MAD=4 → outliers: |v-14| > 12 → only 100
    // source b: constant 5 plus one 6 → med=5, MAD=0 → the 6 flags
    val df = (Seq((10, "a"), (12, "a"), (14, "a"), (20, "a"), (100, "a")) ++
      Seq((5, "b"), (5, "b"), (5, "b"), (6, "b")))
      .zipWithIndex.map { case ((v, s), i) => (i.toLong, v.toLong, s) }
      .toDF("doc_id", "v", "source")
    val got = graft.pipeline.CorpusOps.madOutliers(df, "source", col("v"), 3L)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("median_v"), r.getAs[Long]("mad_v"),
          r.getAs[Long]("n_outliers"))).toMap
    assert(got === Map("a" -> ((14L, 4L, 1L)), "b" -> ((5L, 0L, 1L))))
  }

  test("markov census: per-user order, ties on event_id, exact ppm") {
    val dir = Scratch.freshDir("markov-events")
    Seq(
      // user 1: A -> B -> B (same ms for the last two: event_id orders)
      (1L, new java.sql.Timestamp(1000L), 1L, "A", 1.0, "{}"),
      (2L, new java.sql.Timestamp(2000L), 1L, "B", 1.0, "{}"),
      (3L, new java.sql.Timestamp(2000L), 1L, "B", 1.0, "{}"),
      // user 2: A -> B
      (4L, new java.sql.Timestamp(1000L), 2L, "A", 1.0, "{}"),
      (5L, new java.sql.Timestamp(3000L), 2L, "B", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q36_markov_transitions")(spark, dir)
      .collect().map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type")) ->
        (r.getAs[Long]("n"), r.getAs[Long]("row_ppm"))).toMap
    // row-stochastic: A's only observed successor is B (2 of 2), B's is
    // B (1 of 1) — the same-ms pair (events 2, 3) orders on event_id,
    // so B→B exists and B→A does not
    assert(got === Map(
      ("A", "B") -> ((2L, 1000000L)),
      ("B", "B") -> ((1L, 1000000L))))
  }

  test("trend slope: exact integers feed one IEEE division") {
    val dir = Scratch.freshDir("trend-events")
    // type X: counts 1,2,3 over weeks w, w+1, w+2 → slope exactly 1.0
    val week0 = 2000L // weeks since epoch
    val rows = for {
      (wOff, c) <- Seq((0L, 1), (1L, 2), (2L, 3))
      j <- 0 until c
    } yield ((wOff * 10 + j + 1),
      new java.sql.Timestamp((week0 + wOff) * 7L * 86400000L),
      1L, "X", 1.0, "{}")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = SparkEntry.queries("q37_trend_slopes")(spark, dir).collect()
    assert(r.length === 1)
    assert(r.head.getAs[Long]("n_weeks") === 3L)
    assert(r.head.getAs[Long]("n_events") === 6L)
    assert(r.head.getAs[Double]("slope") === 1.0)
  }
}
