package graft

import org.apache.spark.sql.catalyst.expressions.{BRound, Expression, Round}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

import scala.util.Try

/**
 * ONE walk of every declared query's plans at sf0.001, shared by the
 * whole-surface invariant specs (OracleHygieneSpec's rounding walk,
 * PlanShapeSpec's cartesian census). Building all 285 queries runs
 * their eager fixture-staging side effects (t1's parquet write, the
 * Lloyd training folds), so each suite re-walking the surface would
 * multiply real Spark jobs into every `sbt test` run — the walk runs
 * once per forked test JVM (suites run sequentially there; they
 * already share TestSpark.spark on the same assumption). Facts are
 * reduced to strings per query; QueryExecutions are not retained. A
 * query whose builder THROWS is recorded by name, so the consuming
 * specs report the offender instead of dying on a bare exception.
 */
object SurfaceWalk {

  final case class Facts(roundOffenders: Seq[String], cartesian: Boolean,
      failure: Option[String])

  /** Every Round/BRound over a NON-LITERAL child anywhere in the plan,
   * subquery plans included. A foldable child is a driver-side constant
   * (Catalyst folds it before execution) — constant rounding has no
   * aggregation-order exposure and stays legal. */
  def roundOffenders(plan: LogicalPlan): Seq[String] = {
    def inExpr(e: Expression): Seq[String] = e.collect {
      case r: Round if !r.child.foldable => r.sql
      case b: BRound if !b.child.foldable => b.sql
    }
    plan.collectWithSubqueries { case p => p.expressions.flatMap(inExpr) }
      .flatten
  }

  private val sf = "/root/testdata/sf0.001"

  lazy val facts: Map[String, Facts] = {
    val spark = TestSpark.spark
    val out = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val f = Try {
        val qe = fn(spark, sf).queryExecution
        Facts(roundOffenders(qe.analyzed),
          qe.executedPlan.toString.contains("CartesianProduct"), None)
      }.recover { case e =>
        Facts(Nil, cartesian = false, Some(e.toString))
      }.get
      CacheScope.releaseAll()
      name -> f
    }.toMap
    CacheScope.releaseRun()
    out
  }
}
