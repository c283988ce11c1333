package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.DecimalType

/** Materialized-view query rewrite — the summary-table optimization
  * (Gupta & Mumick's classic MV answering; the planning trick behind
  * cube engines). A registered MV is a pre-aggregation of a base
  * table at some grouping grain; any aggregate query over the base
  * whose grouping is a SUBSET of that grain, whose filters touch only
  * grain columns, and whose measures are rollup-able (SUM re-sums,
  * COUNT(*) becomes SUM(cnt)) is answered from the MV instead — at
  * 100 TB that turns a full fact scan + shuffle into a scan of a
  * grain-sized summary, usually 4-6 orders of magnitude smaller.
  *
  * Soundness rests on two algebraic facts, both pinned in
  * MvRewriteSpec:
  *  - SUM is associative-commutative over the grain partition: the
  *    engine only rewrites sums routed through DecimalType or over
  *    integral columns (the repo's exact-sum discipline), never raw
  *    double sums, whose float addition order WOULD change under
  *    regrouping.
  *  - the MV grain functionally determines every grouping/filter
  *    column the query uses (subset ⇒ determined), so re-aggregating
  *    MV rows partitions base rows exactly once each.
  *
  * The rule is injected via `experimental.extraOptimizations` (the
  * same live-session hook as [[graft.expressions.RewriteDotProduct]])
  * and is a no-op while the registry is empty; writers register an MV
  * only for the scope in which they maintain it (see q155, which
  * builds the MV, registers, answers, and unregisters in a `finally`).
  *
  * Reference anchor: the reference materializes four whole views as
  * its main workload (`Executavel do ETL.py:46-67` — the
  * alimentacao_view_* jobs); this rule is the read-side payoff of
  * those materializations, which the reference leaves to SQL Server.
  */
final case class MvDef(
    basePath: String,
    mvPath: String,
    grain: Seq[String],
    /** base measure column name -> MV column holding its per-grain SUM */
    sumMeasures: Map[String, String],
    /** MV column holding the per-grain COUNT(*) */
    countCol: String,
    /** When set, the MV answers ONLY a scan of exactly this segment
      * set (a CommitLog snapshot's segments): version-pinned MV
      * answering — a time-travel read of any OTHER version never
      * matches, so a maintained MV can never serve stale (or too
      * fresh) data to a pinned-snapshot query. When None, the scan
      * must be the single `basePath` root (a plain parquet table). */
    baseSegments: Option[Seq[String]] = None)

object MvRegistry {
  @volatile private var defs: List[MvDef] = Nil
  def register(d: MvDef): Unit = synchronized { defs = d :: defs }
  def unregister(d: MvDef): Unit =
    synchronized { defs = defs.filterNot(_ == d) }
  def clear(): Unit = synchronized { defs = Nil }
  def all: List[MvDef] = defs
}

object MvRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (MvRegistry.all.isEmpty) plan
    else plan.transformDown {
      case agg: Aggregate =>
        MvRegistry.all.view.flatMap(tryRewrite(agg, _)).headOption
          .getOrElse(agg)
    }

  /** Child shapes accepted under the Aggregate: the base scan,
    * optionally under attribute-only Projects and Filters (the state
    * column pruning / pushdown leave a plan in by this batch). */
  private def unwrap(p: LogicalPlan)
      : Option[(Seq[Expression], LogicalRelation)] = p match {
    case lr: LogicalRelation => Some((Nil, lr))
    case Project(pl, ch) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      unwrap(ch)
    case Filter(cond, ch) =>
      unwrap(ch).map { case (fs, lr) => (cond +: fs, lr) }
    case _ => None
  }

  private def norm(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath

  private def scansBase(lr: LogicalRelation, mv: MvDef): Boolean =
    lr.relation match {
      case fs: HadoopFsRelation =>
        val roots = fs.location.rootPaths.map(_.toUri.getPath).toSet
        mv.baseSegments match {
          case Some(segs) => roots == segs.map(norm).toSet
          case None => roots == Set(norm(mv.basePath))
        }
      case _ => false
    }

  /** SUM argument shapes we can roll up exactly: a bare integral /
    * decimal attribute, or the repo's exact-sum cast
    * `CAST(attr AS DECIMAL(p,s))`. Returns the base column name. */
  private def sumTarget(e: Expression): Option[String] = e match {
    case a: AttributeReference
        if a.dataType.isInstanceOf[DecimalType] ||
          a.dataType == org.apache.spark.sql.types.LongType ||
          a.dataType == org.apache.spark.sql.types.IntegerType =>
      Some(a.name)
    case Cast(a: AttributeReference, _: DecimalType, _, _) => Some(a.name)
    case _ => None
  }

  /** Every attribute OUTSIDE aggregate functions must be grain. */
  private def outsideAttrsOk(e: Expression, grain: Set[String]): Boolean =
    e match {
      case a: AttributeReference => grain(a.name)
      case _: AggregateExpression => true
      case other => other.children.forall(outsideAttrsOk(_, grain))
    }

  private def tryRewrite(agg: Aggregate, mv: MvDef)
      : Option[LogicalPlan] = {
    val grain = mv.grain.toSet
    unwrap(agg.child).flatMap { case (filters, lr) =>
      val groupingOk = agg.groupingExpressions.forall {
        case a: AttributeReference => grain(a.name)
        case _ => false
      }
      val filtersOk = filters.forall(f =>
        f.references.forall(a => grain(a.name)) &&
          f.deterministic &&
          f.collectFirst { case ae: AggregateExpression => ae }.isEmpty)
      val aggsOk = agg.aggregateExpressions.forall { ne =>
        outsideAttrsOk(ne, grain) &&
          ne.collect { case ae: AggregateExpression => ae }.forall {
            case AggregateExpression(Sum(inner, _), _, false, None, _) =>
              sumTarget(inner).exists(mv.sumMeasures.contains)
            case AggregateExpression(Count(Seq(_: Literal)), _, false,
                None, _) => true
            case _ => false
          }
      }
      if (!scansBase(lr, mv) || !groupingOk || !filtersOk ||
        !aggsOk) None
      else rewrite(agg, filters, mv)
    }
  }

  /** Thrown mid-remap when a rollup would not be exactly
    * type-preserving; the rewrite is abandoned, never degraded. */
  private object Bail extends Exception { override def fillInStackTrace = this }

  private def rewrite(agg: Aggregate, filters: Seq[Expression], mv: MvDef)
      : Option[LogicalPlan] = {
    val spark = SparkSession.active
    val mvPlan = spark.read.parquet(mv.mvPath).queryExecution.analyzed
    val byName = mvPlan.output.map(a => a.name -> a).toMap
    // the MV must actually carry every column the rewrite consumes
    val needed = mv.grain ++ mv.sumMeasures.values ++ Seq(mv.countCol)
    if (!needed.forall(byName.contains)) return None

    def remap(e: Expression): Expression = e.transformDown {
      case ae @ AggregateExpression(Sum(inner, ctx), _, false, None, _) =>
        val mvCol = byName(mv.sumMeasures(sumTarget(inner).get))
        val rolled = Sum(mvCol, ctx)
        // an inexact rollup must never silently replace the exact sum
        if (rolled.dataType != ae.dataType) throw Bail
        ae.copy(aggregateFunction = rolled)
      case ae @ AggregateExpression(Count(Seq(_: Literal)), _, false,
          None, _) =>
        val rolled = Sum(byName(mv.countCol))
        if (rolled.dataType != ae.dataType) throw Bail
        ae.copy(aggregateFunction = rolled)
      case a: AttributeReference if byName.contains(a.name) => byName(a.name)
    }

    try {
      val newFilters = filters.map(remap)
      val newGrouping = agg.groupingExpressions.map(remap)
      // top-level output attributes must KEEP their exprIds — parent
      // operators (Sort, Project, …) reference them; a bare grouping
      // attribute therefore becomes an Alias over the MV attribute
      // carrying the original id
      val newAggs = agg.aggregateExpressions.map {
        case a: AttributeReference if byName.contains(a.name) =>
          Alias(byName(a.name), a.name)(exprId = a.exprId)
        case ne => remap(ne).asInstanceOf[NamedExpression]
      }
      val child = newFilters.foldRight(mvPlan)((c, acc) => Filter(c, acc))
      Some(agg.copy(groupingExpressions = newGrouping,
        aggregateExpressions = newAggs, child = child))
    } catch { case Bail => None }
  }
}
