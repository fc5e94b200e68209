package graft

import org.apache.spark.sql.catalyst.expressions.{Alias, And,
  AttributeReference, BRound, Cast, CreateArray, CreateNamedStruct,
  EqualTo, ExplodeBase, Expression,
  Greatest, GreaterThan, GreaterThanOrEqual, In, Least, LessThan,
  LessThanOrEqual, NTile, Pmod, Remainder, Round, RowNumber,
  WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, BROADCAST,
  Filter, Generate, GlobalLimit, LogicalPlan, Project, ResolvedHint,
  Window}
import org.apache.spark.sql.catalyst.util.ArrayData
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
   * Since r19 the walk is INPUT-CARDINALITY-AWARE (the r18 disclosed
   * limit, closed): a GROUPED Aggregate no longer passes the collapse
   * test outright — its output is its grouping-key ndv, so the walk
   * switches to [[keyLeaves]] and a corpus-keyed group (per-part,
   * per-customer, per-shingle) traces through to the scan; and a Window
   * carrying a `row_number() <= k` bound from above is recognized as a
   * per-partition limit (absolute when ungrouped, key-ndv-bounded when
   * grouped — the p72 KMV shape). */
  def scalingBroadcasts(plan: LogicalPlan): Seq[String] =
    scalingBroadcastEvidence(plan).map { case (t, cls, _) => s"$t:$cls" }
      .distinct

  /** The ONE shared hint→scan walk behind both the detector and the
   * BroadcastCensus diagnostic: (table, class, filter chain SQL) per
   * SF-scaling scan reached under a static BROADCAST hint. */
  def scalingBroadcastEvidence(
      plan: LogicalPlan): Seq[(String, String, Seq[String])] =
    plan.collectWithSubqueries {
      case h: ResolvedHint if h.hints.strategy.contains(BROADCAST) =>
        leaves(h.child, Nil)
    }.flatten

  private def smallIntLit(e: Expression): Boolean =
    e.foldable && (e.dataType == LongType || e.dataType == IntegerType) &&
      Try(e.eval()).toOption.exists {
        case l: Long => l > 0 && l <= 4096
        case i: Int => i > 0 && i <= 4096
        case _ => false
      }
  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }
  private def modOf(e: Expression): Option[Long] = e match {
    case EqualTo(Remainder(_, k, _), r) if k.foldable && r.foldable =>
      Try(k.eval()).toOption.collect { case l: Long => l; case i: Int => i.toLong }
    case EqualTo(l, rem: Remainder) => modOf(EqualTo(rem, l))
    case _ => None
  }
  private def classify(filters: Seq[Expression]): String = {
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

  /** The exprIds this Window produces as row_number() — the ONE rank
   * function whose value strictly bounds per-partition row count under a
   * `rn <= k` conjunct. rank()/dense_rank() deliberately do NOT qualify:
   * ties repeat values, so `rank <= k` admits unboundedly many rows. */
  private def rowNumberIds(w: Window): Set[Long] =
    w.windowExpressions.collect {
      case a: Alias if (a.child match {
        case we: WindowExpression => we.windowFunction.isInstanceOf[RowNumber]
        case _ => false
      }) => a.exprId.id
    }.toSet

  /** True when a TOP-LEVEL conjunct in `filters` upper-bounds one of this
   * Window's row_number outputs by a small positive literal (the p72
   * `rn <= k` shape). Conjunct-scoped exactly like the prefix class: a
   * bound inside Or/Not does not bound row count and never matches. */
  private def rankBounded(w: Window, filters: List[Expression]): Boolean = {
    val rn = rowNumberIds(w)
    filters.flatMap(conjuncts).exists {
      case LessThan(a: AttributeReference, r) => rn(a.exprId.id) && smallIntLit(r)
      case LessThanOrEqual(a: AttributeReference, r) => rn(a.exprId.id) && smallIntLit(r)
      case GreaterThan(l, a: AttributeReference) => rn(a.exprId.id) && smallIntLit(l)
      case GreaterThanOrEqual(l, a: AttributeReference) => rn(a.exprId.id) && smallIntLit(l)
      case EqualTo(a: AttributeReference, r) => rn(a.exprId.id) && smallIntLit(r)
      case EqualTo(l, a: AttributeReference) => rn(a.exprId.id) && smallIntLit(l)
      case _ => false
    }
  }

  /** The scan-attribution walk (ROW-cardinality mode): which SF-scaling
   * scans feed this subtree's row count, each tagged with the strongest
   * bound class on the path. Collapses: empty-grouping Aggregate and
   * GlobalLimit (1/k rows); a Window carrying a `row_number <= k` bound
   * from above is a per-partition limit — absolutely bounded when the
   * partitionSpec is empty, bounded by the PARTITION-KEY cardinality
   * otherwise (the walk switches to [[keyLeaves]]). A GROUPED Aggregate's
   * output is its grouping-key ndv, so it also hands off to keyLeaves —
   * the r18 disclosed limit (corpus-keyed aggregates passing the collapse
   * test) is thereby closed for BOTH the broadcast and the global-window
   * census. */
  private def leaves(p: LogicalPlan,
      filters: List[Expression]): Seq[(String, String, Seq[String])] =
    p match {
      case a: Aggregate if a.groupingExpressions.isEmpty => Nil
      case a: Aggregate =>
        // output rows = ndv(grouping keys); rewrite accumulated filters
        // through the agg aliases (HAVING key = lit bounds the key).
        // Conjuncts that REWRITE TO aggregate expressions are DROPPED:
        // `HAVING count(*) < 100` says nothing about the key's ndv, and
        // count(1)'s empty reference set would otherwise sail through
        // resolvability into classify() and launder a corpus-keyed
        // group into a prefix/mod tag (the r19 review-pass finding)
        val aliasByExprId = a.aggregateExpressions.collect {
          case al: Alias => al.exprId -> al.child
        }.toMap
        val rewritten = filters.map(_.transform {
          case attr: AttributeReference =>
            aliasByExprId.getOrElse(attr.exprId, attr)
        }).flatMap(conjuncts).filterNot(_.exists(
          _.isInstanceOf[org.apache.spark.sql.catalyst.expressions
            .aggregate.AggregateExpression]))
        grouped(keyLeaves(a.child, a.groupingExpressions,
          resolvable(rewritten, a.child.outputSet)))
      case _: GlobalLimit => Nil
      case f: Filter => leaves(f.child, f.condition :: filters)
      case w: Window if rankBounded(w, filters) =>
        if (w.partitionSpec.isEmpty) Nil // ≤ k rows outright
        else grouped(keyLeaves(w.child, w.partitionSpec,
          resolvable(filters, w.child.outputSet)))
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
        leaves(pr.child, resolvable(rewritten, pr.child.outputSet))
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          val paths = fs.location.rootPaths.map(_.toString)
          ScalingTables.filter(t => paths.exists(_.endsWith(s"/$t.parquet")))
            .map(t => (t, classify(filters), filters.map(_.sql)))
        case _ => Nil
      }
      case other => other.children.flatMap { ch =>
        leaves(ch, resolvable(filters, ch.outputSet))
      }
    }

  /** A `group-` class marks evidence that entered KEY-cardinality mode:
   * the reported quantity is the ndv of a grouping/partition key traced
   * to this scan, not the scan's own row count. `group-raw` therefore
   * means "key ndv not statically bounded" — adjudicable when the key's
   * DOMAIN is a data-model constant (lang, source, a histogram bucket),
   * unlike direct `raw` which is never allowlistable. Idempotent so
   * nested groupings don't stack prefixes. */
  private def grouped(res: Seq[(String, String, Seq[String])]):
      Seq[(String, String, Seq[String])] =
    res.map { case (t, c, f) =>
      (t, if (c.startsWith("group-")) c else s"group-$c", f)
    }

  /** KEY-cardinality mode: how many DISTINCT values can `keys` take?
   * Reached from a grouped collapse (grouped Aggregate, rank-bounded
   * grouped Window) whose output row count is the key ndv. A key is
   * discharged when its FORM bounds it (foldable; `x % k` / pmod with a
   * small literal; ntile(k) output) or a top-level conjunct pins it to a
   * literal domain (`k = lit`, `k IN (lits)` — these bound ndv though
   * they never bound row counts) or to a small integer prefix (the
   * dense-id contract, as in the row-mode prefix class). Everything
   * else FAILS CLOSED: a key the walk cannot trace falls back to
   * row-mode [[leaves]] on the subtree, which is sound because
   * ndv(keys) ≤ rows(input) — so an untraceable corpus-keyed group
   * reports the underlying scan instead of silently passing. */
  /** Data-model DOMAIN contract (the ScalingTables / dense-id-contract
   * discipline, applied to ndv): columns whose distinct-value count is a
   * categorical-domain constant at every SF — language codes and the
   * source/crawl registry — never a corpus fraction. A grouping key
   * built ONLY from these discharges in key mode; anything touching
   * doc_id/text/hashes/tokens stays live and traces to the scan.
   * EVIDENCE-BACKED, not trust-me: PlanShapeSpec "domain contract:
   * lang/source ndv is SF-invariant and bounded" measures ndv(lang)/
   * ndv(source) at BOTH gate SFs, asserts equality across a 10× row
   * scale-up and the documented domain ceilings, and pins this set's
   * exact membership — fixture drift or a membership edit without new
   * evidence fails there by name. */
  val DomainColumns: Set[String] = Set("lang", "source")

  private def uncast(e: Expression): Expression = e match {
    case c: Cast => uncast(c.child)
    case _ => e
  }

  /** Accumulated filters that can follow a walk into `out`'s subtree —
   * split into TOP-LEVEL CONJUNCTS first, so `rn <= 10 AND key = lit`
   * keeps its key conjunct when rn drops at the window boundary
   * (conjunct-scoped semantics are unchanged: every consumer already
   * looks only at top-level conjuncts). */
  private def resolvable(filters: List[Expression],
      out: org.apache.spark.sql.catalyst.expressions.AttributeSet):
      List[Expression] =
    filters.flatMap(conjuncts).filter(_.references.subsetOf(out))

  private def intLit(e: Expression): Option[Long] =
    if (e.foldable && (e.dataType == LongType || e.dataType == IntegerType))
      Try(e.eval()).toOption.collect {
        case l: Long => l
        case i: Int => i.toLong
      }
    else None

  private def keyLeaves(p: LogicalPlan, keys: Seq[Expression],
      filters: List[Expression]): Seq[(String, String, Seq[String])] = {
    val cs = filters.flatMap(conjuncts)
    def strip(e: Expression): Expression = e match {
      case a: Alias => strip(a.child)
      case _ => e
    }
    def formBounded(e: Expression): Boolean = strip(e) match {
      case x if x.foldable => true
      // x % k / pmod(x, k) as the key ITSELF: ndv ≤ k ABSOLUTELY (a
      // corpus-independent bound, unlike the mod FILTER whose survivor
      // count is corpus/k) — so the cap is the generous 2¹⁶, not the
      // prefix class's 4096 (p48's bloom m=16384 slot key)
      case Remainder(_, m, _) => intLit(m).exists(k => k > 0 && k <= 65536)
      case Pmod(_, m, _) => intLit(m).exists(k => k > 0 && k <= 65536)
      // clamp: least(greatest(x, lo), hi) with literal bounds spanning
      // ≤ 4096 values bounds ndv by the clamp range (the p114 margin
      // bucket / p116 codepoint-bucket shape); least alone does NOT —
      // an unbounded-below integer stays unbounded under least(x, k)
      // clamp discharge is restricted to EXACTLY the binary shapes
      // least(greatest(x, lo), hi) / greatest(least(x, hi), lo): with a
      // third operand the extremum is no longer pinned to the literal
      // range (least(clamp(x), y) is unbounded below through y — the
      // r19 review-pass finding)
      case l: Least => l.children.map(uncast) match {
        case Seq(a, b) => Seq((a, b), (b, a)).exists {
          case (hiE, g: Greatest) => intLit(hiE).exists { h =>
            g.children.map(uncast) match {
              case Seq(x, y) => Seq(x, y).flatMap(intLit(_))
                .exists(w => h >= w && h - w <= 4096)
              case _ => false
            }
          }
          case _ => false
        }
        case _ => false
      }
      case g: Greatest => g.children.map(uncast) match {
        case Seq(a, b) => Seq((a, b), (b, a)).exists {
          case (loE, l: Least) => intLit(loE).exists { w =>
            l.children.map(uncast) match {
              case Seq(x, y) => Seq(x, y).flatMap(intLit(_))
                .exists(h => h >= w && h - w <= 4096)
              case _ => false
            }
          }
          case _ => false
        }
        case _ => false
      }
      case c: Cast => formBounded(c.child)
      case _ => false
    }
    def filterBounded(k0: Expression): Boolean = {
      val k = strip(k0)
      cs.exists {
        case EqualTo(l, r) =>
          (r.foldable && l.semanticEquals(k)) ||
            (l.foldable && r.semanticEquals(k))
        case In(v, list) => v.semanticEquals(k) && list.nonEmpty &&
          list.size <= 4096 && list.forall(_.foldable)
        case LessThan(v, r) => v.semanticEquals(k) && smallIntLit(r)
        case LessThanOrEqual(v, r) => v.semanticEquals(k) && smallIntLit(r)
        case GreaterThan(l, v) => v.semanticEquals(k) && smallIntLit(l)
        case GreaterThanOrEqual(l, v) => v.semanticEquals(k) && smallIntLit(l)
        case _ => false
      }
    }
    val live = keys.filterNot(k => formBounded(k) || filterBounded(k))
    if (live.isEmpty) Nil
    else p match {
      case _: GlobalLimit => Nil // ndv ≤ rows ≤ k
      case f: Filter => keyLeaves(f.child, live, f.condition :: filters)
      case pr: Project =>
        val aliasByExprId = pr.projectList.collect {
          case a: Alias => a.exprId -> a.child
        }.toMap
        def rw(e: Expression): Expression = e.transform {
          case attr: AttributeReference =>
            aliasByExprId.getOrElse(attr.exprId, attr)
        }
        val k2 = live.map(rw)
        if (k2.forall(_.references.subsetOf(pr.child.outputSet)))
          keyLeaves(pr.child, k2,
            resolvable(filters.map(rw), pr.child.outputSet))
        else leaves(pr, filters)
      case g: Generate =>
        // a key that is a pure function of this generator's OUTPUT:
        // bounded when the generator input is FOLDABLE with ≤ 4096
        // elements (p103's explode(sequence(0,63)) replica axis, the
        // exactQuantiles literal quantile array), or an explicit array
        // whose every element/struct-field is formBounded (the CM-sketch
        // explode(array(struct(lit(i), hash % w))) and Bloom position
        // shapes — ndv ≤ len · modulus regardless of the corpus). A
        // corpus-fed generator (exploded tokens) stays live → fallback.
        val genIds = g.generatorOutput.map(_.exprId.id).toSet
        def structBounded(e: Expression): Boolean = e match {
          case cns: CreateNamedStruct => cns.valExprs.forall(formBounded)
          case other => formBounded(other)
        }
        lazy val genBounded = g.generator match {
          case e: ExplodeBase if e.child.foldable =>
            Try(e.child.eval()).toOption.exists {
              case ad: ArrayData => ad.numElements() <= 4096
              case null => true
              case _ => false
            }
          case e: ExplodeBase => e.child match {
            // explicit arrays are sketch-geometry shapes (d rows × w
            // slots): a tight element count keeps the implied ndv bound
            // (Σ per-element bounds) at sketch scale, not corpus scale
            case ca: CreateArray =>
              ca.children.size <= 64 && ca.children.forall(structBounded)
            case _ => false
          }
          case _ => false
        }
        val (produced, passed) = live.partition(e =>
          e.references.nonEmpty &&
            e.references.forall(a => genIds(a.exprId.id)))
        if (produced.isEmpty || genBounded) {
          if (passed.isEmpty) Nil // all live keys were bounded generator outputs
          else if (passed.forall(_.references.subsetOf(g.child.outputSet)))
            keyLeaves(g.child, passed,
              resolvable(filters, g.child.outputSet))
          else leaves(g, filters)
        } else leaves(g, filters)
      case w: Window =>
        // a key this window PRODUCES: ntile(k) output is k-bounded;
        // any other window output falls back to rows-of-input
        val byId = w.windowExpressions.collect {
          case al: Alias => al.exprId.id -> al.child
        }.toMap
        def producedBounded(e: Expression): Boolean = strip(e) match {
          case a: AttributeReference => byId.get(a.exprId.id).exists {
            case we: WindowExpression => we.windowFunction match {
              case nt: NTile => smallIntLit(nt.buckets)
              case _ => false
            }
            case _ => false
          }
          case _ => false
        }
        val (produced, passed) = live.partition(e =>
          byId.contains(strip(e) match {
            case a: AttributeReference => a.exprId.id
            case _ => -1L
          }))
        if (produced.forall(producedBounded)) {
          if (passed.isEmpty) Nil
          else keyLeaves(w.child, passed,
            resolvable(filters, w.child.outputSet))
        } else leaves(w, filters)
      case lr: LogicalRelation =>
        // at the scan: keys built ONLY from categorical-domain columns
        // (the DomainColumns data-model contract) discharge; anything
        // else reports via row mode (ndv ≤ rows, with the filter-chain
        // classification as the evidence)
        if (live.forall(k => k.references.nonEmpty &&
            k.references.forall(a => DomainColumns(a.name)))) Nil
        else leaves(lr, filters)
      case u: org.apache.spark.sql.catalyst.plans.logical.Union =>
        // Union output carries the FIRST child's exprIds, but EVERY
        // branch contributes values to the key's domain — rewrite the
        // keys positionally into each child and trace ALL of them; a
        // branch the rewrite cannot reach fails closed via row mode
        // (the review-pass hole: the generic walk silently discharged
        // every branch after the first)
        u.children.flatMap { ch =>
          val byPos = u.output.map(_.exprId.id)
            .zip(ch.output.map(a => a: Expression)).toMap
          def rw(e: Expression): Expression = e.transform {
            case a: AttributeReference => byPos.getOrElse(a.exprId.id, a)
          }
          val ks = live.map(rw)
          if (ks.forall(_.references.subsetOf(ch.outputSet)))
            keyLeaves(ch, ks, resolvable(filters.map(rw), ch.outputSet))
          else leaves(ch, resolvable(filters, ch.outputSet))
        }
      case other if other.children.nonEmpty =>
        // generic pass-through (Deduplicate, Sort, SubqueryAlias, Join
        // sides…): follow each key into the child that can resolve it —
        // sound for joins (a join never ADDS key values; ndv is bounded
        // by the key-bearing side) and for Except/Intersect (output =
        // left side). A key resolving into NO child (or a node needing
        // row semantics, e.g. grouped Aggregate aliases) falls back to
        // row-mode on this subtree — ndv ≤ rows, fail closed.
        val (traceable, lost) = live.partition(k =>
          other.children.exists(ch => k.references.nonEmpty &&
            k.references.subsetOf(ch.outputSet)))
        if (lost.nonEmpty) leaves(other, filters)
        else other.children.flatMap { ch =>
          val ks = traceable.filter(_.references.subsetOf(ch.outputSet))
          if (ks.isEmpty) Nil
          else keyLeaves(ch, ks, resolvable(filters, ch.outputSet))
        }
      case _ => leaves(p, filters)
    }
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
    globalWindowEvidence(plan).map { case (t, cls, _) => s"$t:$cls" }

  /** Per-global-window evidence with the filter chains, for the census
   * diagnostic and the detector alike. The walk runs DIRECTLY on the
   * window's input path (r18 used a synthetic ResolvedHint + the full
   * hint collector, which also matched REAL nested broadcast hints below
   * collapse stops — the p35/p37 artifact). Tags are distinct per window
   * but NOT across windows: each global window contributes its own
   * occurrences, so the PlanShapeSpec allowlist pins a COUNT per
   * (query, tag) and a second raw window over an already-allowlisted
   * table fails instead of riding the same entry. */
  def globalWindowEvidence(
      plan: LogicalPlan): Seq[(String, String, Seq[String])] =
    plan.collectWithSubqueries {
      case w: Window if w.partitionSpec.isEmpty =>
        // distinct (table, class) per window, one representative chain
        leaves(w.child, Nil).groupBy(h => (h._1, h._2)).map(_._2.head)
          .toSeq.sortBy(h => (h._1, h._2))
    }.flatten

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
