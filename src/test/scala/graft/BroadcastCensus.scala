package graft

import scala.util.Try

/** Diagnostic census behind PlanShapeSpec's static-broadcast walk: for
 * every query whose analyzed plan carries a BROADCAST hint over an
 * SF-scaling scan, print the classification AND the filter chain
 * between hint and scan — the evidence that adjudicates each allowlist
 * entry as literal-bounded (`prefix`), model-scale by operator contract
 * (`mod<k>`), or a genuine r15 offender (`raw`). Consumes the SAME walk
 * the detector uses ([[SurfaceWalk.scalingBroadcastEvidence]]), so the
 * printed evidence can never drift from what the spec classified.
 * Run: sbt 'Test/runMain graft.BroadcastCensus [keys…]'. */
object BroadcastCensus {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val sf = "/root/testdata/sf0.001"
    val names = if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      Try {
        val analyzed = SparkEntry.queries(name)(spark, sf)
          .queryExecution.analyzed
        val hits = SurfaceWalk.scalingBroadcastEvidence(analyzed)
        if (hits.nonEmpty) {
          println(s"[census] $name -> " +
            hits.map { case (t, c, _) => s"$t:$c" }.distinct.mkString(","))
          hits.foreach { case (t, cls, filters) =>
            println(s"[census]   $t:$cls via filters: " +
              (if (filters.isEmpty) "(NONE)" else filters.mkString(" AND ")))
          }
        }
        val wins = SurfaceWalk.globalWindowEvidence(analyzed)
        if (wins.nonEmpty) {
          println(s"[census] $name GLOBALWIN -> " +
            wins.map { case (t, c, _) => s"$t:$c" }.mkString(","))
          wins.foreach { case (t, cls, filters) =>
            println(s"[census]   globalwin $t:$cls via filters: " +
              (if (filters.isEmpty) "(NONE)" else filters.mkString(" AND ")))
          }
        }
      }.recover { case e => println(s"[census] $name FAILED: $e") }
      CacheScope.releaseAll()
    }
    CacheScope.releaseRun()
    println("[census] done")
  }
}
