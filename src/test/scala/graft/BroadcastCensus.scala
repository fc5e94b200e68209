package graft

import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, BROADCAST,
  Filter, GlobalLimit, LogicalPlan, ResolvedHint}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
  LogicalRelation}

import scala.util.Try

/** Diagnostic census behind PlanShapeSpec's static-broadcast walk: for
 * every query whose analyzed plan carries a BROADCAST hint over an
 * SF-scaling scan (SurfaceWalk.scalingBroadcasts), print the FILTER
 * chain between the hint and the scan — the evidence that classifies
 * each site as literal-bounded (vec_id < k prefix sets), model-scale
 * by operator contract (the % 50 centroid rule), or a genuine r15
 * offender. Run: sbt 'Test/runMain graft.BroadcastCensus [keys…]'. */
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
        val hits = SurfaceWalk.scalingBroadcasts(analyzed)
        if (hits.nonEmpty) {
          println(s"[census] $name -> ${hits.mkString(",")}")
          analyzed.collectWithSubqueries {
            case h: ResolvedHint if h.hints.strategy.contains(BROADCAST) =>
              def walk(p: LogicalPlan, filters: List[String]): Unit = p match {
                case _: Aggregate | _: GlobalLimit => ()
                case f: Filter =>
                  walk(f.child, f.condition.sql :: filters)
                case lr: LogicalRelation => lr.relation match {
                  case fs: HadoopFsRelation =>
                    val paths = fs.location.rootPaths.map(_.toString)
                    SurfaceWalk.ScalingTables
                      .filter(t => paths.exists(_.endsWith(s"/$t.parquet")))
                      .foreach { t =>
                        println(s"[census]   $t via filters: " +
                          (if (filters.isEmpty) "(NONE)"
                           else filters.mkString(" AND ")))
                      }
                  case _ => ()
                }
                case other => other.children.foreach(walk(_, filters))
              }
              walk(h.child, Nil)
          }
        }
      }.recover { case e => println(s"[census] $name FAILED: $e") }
      CacheScope.releaseAll()
    }
    CacheScope.releaseRun()
    println("[census] done")
  }
}
