package graft

import graft.pipeline.DedupOps
import org.apache.spark.sql.functions._

/** Rehearsal diagnostic for the two exact-dedup headliners: counts the
 * prefix joins' OWN candidate relations ([[DedupOps
 * .jaccardPrefixCandidates]] / [[DedupOps.containmentPrefixCandidates]]
 * — the same code p109/p134 execute, not a re-derivation) plus the
 * verified output pair counts, at the p109/p134 declared parameters
 * (n = 3, t = 0.5 / 0.7). These are the "candidate counts that justify
 * the walls" rows PLAN_AUDIT files next to the fresh-JVM Bench walls on
 * a ScaleGen `distinct`-mode corpus.
 * Run: sbt 'Test/runMain graft.DedupScaleWalls <corpusDir> [stages]'
 * where stages is a comma list from
 * {shingles,jcands,jpairs,ccands,cpairs} (default: all) — the 1000×
 * tier runs the cheap candidate counts first and the full joins only
 * as disk allows. */
object DedupScaleWalls {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    // Bench-style session, NOT TestSpark's local[4]/4-partition spec
    // session: the rehearsal joins shuffle tens of millions of shingle
    // rows, and walls filed from a 4-core 4-partition config would
    // measure the test harness, not the operator (the r18 review-pass
    // finding — the first 100× filing ran 8× under machine throughput).
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-dedup-walls")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.prepare(spark)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    println(s"[walls] corpus=$dir docs=${docs.count()}")
    val sh = CacheScope.track(
      DedupOps.docShingles(docs, "doc_id", "text", 3))
    def timed(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[walls] $label%-22s $n%12d rows  ${(System.nanoTime() - t0) / 1e9}%8.1f s")
    }
    val stages = args.lift(1).map(_.split(',').toSet)
      .getOrElse(Set("shingles", "jcands", "jpairs", "ccands", "cpairs"))
    if (stages("shingles")) timed("shingles")(sh.count())
    if (stages("jcands")) timed("jaccard-candidates")(
      DedupOps.jaccardPrefixCandidates(sh, 500000L).count())
    if (stages("jpairs")) timed("jaccard-pairs")(
      DedupOps.jaccardPrefixJoin(docs, "doc_id", "text", 3, 500000L,
        preShingles = Some(sh)).count())
    if (stages("ccands")) timed("containment-cands")(
      DedupOps.containmentPrefixCandidates(sh, 700000L).count())
    if (stages("cpairs")) timed("containment-pairs")(
      DedupOps.containmentPrefixJoin(docs, "doc_id", "text", 3, 700000L,
        preShingles = Some(sh)).count())
    CacheScope.releaseRun() // releaseRun subsumes releaseAll
    println("[walls] done")
  }
}
