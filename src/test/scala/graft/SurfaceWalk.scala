package graft

import org.apache.spark.sql.catalyst.expressions.{Alias, And,
  AttributeReference, BRound, EqualTo, Expression, GreaterThan,
  GreaterThanOrEqual, LessThan, LessThanOrEqual, Remainder, Round}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, BROADCAST,
  Filter, GlobalLimit, LogicalPlan, Project, ResolvedHint, Window}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
  LogicalRelation}
import org.apache.spark.sql.types.{IntegerType, LongType}

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
      scalingBroadcasts: Seq[String], singlePartitionExchanges: Int,
      globalWindowScans: Seq[String], failure: Option[String])

  /** The parquet tables whose row count scales with the corpus (TPC-H SF
   * tables + the pipeline tables). nation/region are absent by design:
   * 25/5 rows at every SF. */
  val ScalingTables: Seq[String] = Seq("lineitem", "orders", "customer",
    "part", "supplier", "events", "documents", "embeddings")

  /** The r15 un-demotable-broadcast class, whole-surface: SF-scaling
   * parquet scans reachable under a static BROADCAST hint in the
   * ANALYZED plan without crossing a cardinality-collapsing node.
   * The hint lives in the logical plan independent of statistics, so the
   * detector is SF-invariant — exactly the property that let the q-family
   * sites stay correct-and-fast at every reachable tier while being a
   * guaranteed OOM at the 100 TB design point (AQE re-plans estimates,
   * never user hints). Aggregate and GlobalLimit count as collapses: a
   * 1-row/k-row/histogram-scale derivation of a corpus table is a
   * legitimate broadcast (q7's max row, q6b's cutoffs, q32's quintiles).
   *
   * Each reached scan is tagged with the strongest cardinality bound the
   * filter chain between hint and scan carries:
   *  - `table:prefix` — a TOP-LEVEL CONJUNCT upper-bounding a non-foldable
   *    expression by a small positive integer literal (`vec_id < 10`,
   *    bound ≤ 4096): an absolutely bounded prefix set under the
   *    fixture's dense-id contract (the ANN/decontamination query sets).
   *  - `table:mod<k>` — a top-level conjunct `x % k = j` (`vec_id % 50 =
   *    0` → `mod50`): the fixture's centroid/benchmark rule — corpus/k
   *    rows, bounded ONLY by the operator's model-scale contract
   *    (|centroids|, |benchmark| are model hyperparameters at 100 TB,
   *    not corpus fractions; the k-means driver folds the same relation,
   *    so the bound is already load-bearing there). The modulus is part
   *    of the tag, so a slice drifting denser (% 50 → % 2) breaks the
   *    PlanShapeSpec allowlist by name instead of hiding under a shared
   *    label. Allowlisted per query, by name.
   *  - `table:raw`    — NO cardinality bound on any path (raw dims,
   *    date/attribute-filtered facts, projections/semi-probes of them):
   *    the exact class the r18 sweep deleted. NEVER allowlistable.
   * A path carrying both shapes takes `prefix` (it IS bounded).
   * Classification is deliberately conjunct-scoped: a bound inside
   * Or/Not (`!(vec_id < 10)`, `vec_id < 10 OR vec_id > 5000`) does NOT
   * bound cardinality and stays `raw`; and when the walk descends past a
   * multi-child node (a join under the hint), an accumulated filter
   * follows only children whose output can resolve its references, so a
   * bound on the OTHER join side's column never launders a scaling scan.
   * Known limit, disclosed: an Aggregate grouped BY a corpus-scale key
   * (per-part, per-customer) passes the collapse test although its
   * output still scales — that subclass has never appeared hinted here;
   * the census errs toward evidence-backed classes over guesses. */
  def scalingBroadcasts(plan: LogicalPlan): Seq[String] =
    scalingBroadcastEvidence(plan).map { case (t, cls, _) => s"$t:$cls" }
      .distinct

  /** The ONE shared hint→scan walk behind both the detector and the
   * BroadcastCensus diagnostic: (table, class, filter chain SQL) per
   * SF-scaling scan reached under a static BROADCAST hint. */
  def scalingBroadcastEvidence(
      plan: LogicalPlan): Seq[(String, String, Seq[String])] = {
    def smallIntLit(e: Expression): Boolean =
      e.foldable && (e.dataType == LongType || e.dataType == IntegerType) &&
        Try(e.eval()).toOption.exists {
          case l: Long => l > 0 && l <= 4096
          case i: Int => i > 0 && i <= 4096
          case _ => false
        }
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    def modOf(e: Expression): Option[Long] = e match {
      case EqualTo(Remainder(_, k, _), r) if k.foldable && r.foldable =>
        Try(k.eval()).toOption.collect { case l: Long => l; case i: Int => i.toLong }
      case EqualTo(l, rem: Remainder) => modOf(EqualTo(rem, l))
      case _ => None
    }
    def classify(filters: Seq[Expression]): String = {
      val cs = filters.flatMap(conjuncts)
      val prefix = cs.exists {
        case LessThan(x, r) => !x.foldable && smallIntLit(r)
        case LessThanOrEqual(x, r) => !x.foldable && smallIntLit(r)
        case GreaterThan(l, x) => !x.foldable && smallIntLit(l)
        case GreaterThanOrEqual(l, x) => !x.foldable && smallIntLit(l)
        case _ => false
      }
      lazy val mods = cs.flatMap(modOf)
      if (prefix) "prefix"
      else if (mods.nonEmpty) s"mod${mods.max}"
      else "raw"
    }
    def leaves(p: LogicalPlan,
        filters: List[Expression]): Seq[(String, String, Seq[String])] =
      p match {
        case _: Aggregate => Nil
        case _: GlobalLimit => Nil
        case f: Filter => leaves(f.child, f.condition :: filters)
        case pr: Project =>
          // rewrite accumulated filters THROUGH the projection's aliases
          // (qid < 10 above Project(vec_id AS qid) is a bound on vec_id)
          // so renaming can't strip a real bound into a raw false alarm
          val aliasByExprId = pr.projectList.collect {
            case a: Alias => a.exprId -> a.child
          }.toMap
          val rewritten = filters.map(_.transform {
            case attr: AttributeReference =>
              aliasByExprId.getOrElse(attr.exprId, attr)
          })
          leaves(pr.child,
            rewritten.filter(_.references.subsetOf(pr.child.outputSet)))
        case lr: LogicalRelation => lr.relation match {
          case fs: HadoopFsRelation =>
            val paths = fs.location.rootPaths.map(_.toString)
            ScalingTables.filter(t => paths.exists(_.endsWith(s"/$t.parquet")))
              .map(t => (t, classify(filters), filters.map(_.sql)))
          case _ => Nil
        }
        case other => other.children.flatMap { ch =>
          leaves(ch, filters.filter(_.references.subsetOf(ch.outputSet)))
        }
      }
    plan.collectWithSubqueries {
      case h: ResolvedHint if h.hints.strategy.contains(BROADCAST) =>
        leaves(h.child, Nil)
    }.flatten
  }

  /** The corpus-scale subclass of the Exchange SinglePartition census,
   * detected where it is DECIDABLE: a Window with an EMPTY partitionSpec
   * plans a single-partition exchange of its whole input (Spark's own
   * "No Partition Defined for Window operation" warning), so a global
   * window whose input subtree reaches an SF-scaling scan without
   * crossing a cardinality collapse serializes the corpus through one
   * task at 100 TB. Same walk and classes as
   * [[scalingBroadcastEvidence]] (raw = corpus-scale input, the
   * dangerous class; prefix/mod<k> = bounded/contract-bounded;
   * Aggregate/GlobalLimit = collapsed, not reported). The raw count-only
   * SinglePartition census (PLAN_AUDIT round-18 addendum 2) stays a
   * diagnostic because a COUNT has no boundedness signal — this walk is
   * the input-cardinality-aware pin it called for, scoped to the one
   * shape where the logical plan states the serialization outright. */
  def globalWindowScans(plan: LogicalPlan): Seq[String] =
    plan.collectWithSubqueries {
      case w: Window if w.partitionSpec.isEmpty =>
        scalingBroadcastEvidenceLeaves(w.child)
    }.flatten.map { case (t, cls, _) => s"$t:$cls" }.distinct

  /** Shared leaves walk, exposed for [[globalWindowScans]]. */
  private def scalingBroadcastEvidenceLeaves(
      plan: LogicalPlan): Seq[(String, String, Seq[String])] = {
    // reuse the full evidence machinery by wrapping the subtree in a
    // synthetic broadcast hint: ONE classification code path
    scalingBroadcastEvidence(
      ResolvedHint(plan,
        org.apache.spark.sql.catalyst.plans.logical.HintInfo(
          strategy = Some(BROADCAST))))
  }

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
        val physical = qe.executedPlan.toString
        Facts(roundOffenders(qe.analyzed),
          physical.contains("CartesianProduct"),
          scalingBroadcasts(qe.analyzed),
          "Exchange SinglePartition".r.findAllIn(physical).size,
          globalWindowScans(qe.analyzed), None)
      }.recover { case e =>
        Facts(Nil, cartesian = false, Nil, 0, Nil, Some(e.toString))
      }.get
      CacheScope.releaseAll()
      name -> f
    }.toMap
    CacheScope.releaseRun()
    out
  }
}
