package graft.plans

import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan,
  Statistics}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.read.SupportsReportStatistics
import org.apache.spark.sql.execution.datasources.v2.{
  DataSourceV2ScanRelation, V1ScanWrapper}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}

/** Relay size statistics past Spark's `V1ScanWrapper`.
  *
  * The commit-log connector serves deletion-vector'd and
  * column-mapped tables through `V1Scan` bridges (the public hook
  * for scans whose execution is itself a DataFrame plan). Those
  * scans DO implement `SupportsReportStatistics`, but during
  * pushdown Spark wraps every V1Scan in `V1ScanWrapper` — a plain
  * `Scan` — so `DataSourceV2ScanRelation.computeStats` can no longer
  * see the interface and reports the default (effectively infinite)
  * size. Consequence without this relay: a 2 MB dimension that
  * happens to carry a deletion vector NEVER statically broadcasts —
  * every join against it plans sort-merge and pays the full shuffle
  * of the fact side, hoping AQE converts at runtime (which still
  * pays the map-side shuffle write). At 100 TB that is the single
  * largest avoidable cost in a star join.
  *
  * Mechanics (the `LogicalQueryStage` trick AQE itself uses): a
  * post-pushdown optimizer rule wraps the affected scan relation in
  * a LEAF node that holds it as a HIDDEN plan and reports the
  * bridge's statistics from `computeStats` (leaf stats are the only
  * ones the size visitor consults); a one-line planner strategy
  * erases the node by planning the hidden child. The rule MUST run
  * after `V2ScanRelationPushDown`, and no `SparkSessionExtensions`
  * injection point does (operator rules and even "Pre CBO Rules"
  * run earlier) — so it rides `spark.experimental.extraOptimizations`
  * ("User Provided Optimizers", after pushdown), registered by
  * [[graft.expressions.GraftExtensions.register]] AFTER MvRewrite
  * so MV matching sees the un-hidden relation first.
  */
case class ScanStatsHolder(hidden: LogicalPlan, reported: Statistics)
    extends LeafNode {
  override def output: Seq[Attribute] = hidden.output
  override def computeStats(): Statistics = reported
  override def simpleString(maxFields: Int): String =
    s"ScanStatsHolder(sizeInBytes=${reported.sizeInBytes}) " +
      hidden.simpleString(maxFields)
}

/** Post-pushdown rule: expose a wrapped V1Scan's statistics to join
  * selection. Applies to ANY V1 bridge that reports statistics, not
  * just the commit-log ones. Idempotent under the fixed-point batch:
  * the wrapped relation is hidden (not a child), so the transform
  * never revisits it. */
object RelayV1ScanStatistics extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformUp {
      case rel: DataSourceV2ScanRelation => rel.scan match {
        case w: V1ScanWrapper => w.v1Scan match {
          case s: SupportsReportStatistics =>
            val est = s.estimateStatistics()
            if (est.sizeInBytes.isPresent)
              ScanStatsHolder(rel, Statistics(
                sizeInBytes = BigInt(est.sizeInBytes.getAsLong),
                rowCount =
                  if (est.numRows.isPresent)
                    Some(BigInt(est.numRows.getAsLong))
                  else None))
            else rel
          case _ => rel
        }
        case _ => rel
      }
    }
}

/** Erase [[ScanStatsHolder]] at physical planning — the node exists
  * only so the logical stats visitor reads the relayed statistics. */
object ScanStatsStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case ScanStatsHolder(hidden, _) => planLater(hidden) :: Nil
    case _ => Nil
  }
}
