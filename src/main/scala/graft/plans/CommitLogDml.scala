package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeReference, AttributeSet, EqualTo, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, InsertAction, LogicalPlan, MergeIntoTable, SubqueryAlias, UpdateAction, UpdateTable}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, V2CommandExec}
import org.apache.spark.sql.functions.lit

import graft.sources.{CommitLog, CommitLogTable}

/** SQL `UPDATE … SET` and `MERGE INTO` over commit-log tables — the
  * two statements a migrating Delta user types first.
  *
  * Spark's generic hook for these (`SupportsRowLevelOperations`) is
  * the group-based rewrite Iceberg uses: without its runtime
  * group-filtering subquery machinery the connector is handed the
  * ENTIRE table to rewrite, every statement. The engine already has a
  * better executor: [[CommitLog.update]]/[[CommitLog.mergeInto]]
  * bound the copy-on-write to the segments that actually hold
  * matched keys (plus CDC recording, OCC retry, and the duplicate-
  * source-key refusal). So — the same public design choice Delta
  * makes on Spark, where MERGE is a Delta command rather than the
  * generic rewrite — this strategy intercepts the resolved
  * `UpdateTable` / `MergeIntoTable` logical commands at planning time
  * (extra strategies are consulted before the built-in
  * DataSourceV2Strategy raises "does not support UPDATE TABLE") and
  * routes them through the bounded protocol path.
  *
  * Resolved column references are rewritten NAME-BASED before they
  * are re-applied to the freshly-read table frame inside the
  * protocol executor (a foreign `exprId` would not resolve there):
  * target attributes keep their names; MERGE source attributes map to
  * the executor's `__src_<name>` join-side naming (key columns stay
  * plain — the join coalesces them). Statement shapes the protocol
  * executor cannot express fail LOUDLY with the exact limitation
  * (never a silent wrong answer): non-equi or differently-named merge
  * keys, more than one UPDATE/DELETE clause, non-name-aligned INSERT
  * expressions, `WHEN NOT MATCHED BY SOURCE`, schema evolution,
  * subqueries in conditions.
  */
object CommitLogDmlStrategy extends SparkStrategy {

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case UpdateTable(rel, assignments, condition) =>
      commitLogPath(rel).map { path =>
        CommitLogUpdateExec(path, assignments, condition) :: Nil
      }.getOrElse(Nil)
    case m: MergeIntoTable =>
      commitLogPath(m.targetTable).map { path =>
        CommitLogMergeExec(path, m) :: Nil
      }.getOrElse(Nil)
    case _ => Nil
  }

  private def commitLogPath(plan: LogicalPlan): Option[String] =
    plan match {
      case SubqueryAlias(_, child) => commitLogPath(child)
      // the optimizer's scan pushdown wraps the relation before
      // strategies run — match both shapes
      case s: org.apache.spark.sql.execution.datasources.v2
          .DataSourceV2ScanRelation => commitLogPath(s.relation)
      case r: DataSourceV2Relation => r.table match {
        case t: CommitLogTable => Some(t.tablePath)
        case _ => None
      }
      case _ => None
    }

  private def unsupported(what: String): Nothing =
    throw new UnsupportedOperationException(
      s"commitlog SQL DML: $what. The protocol executor " +
        "(CommitLog.update/mergeInto) supports equi-key merges with " +
        "at most one UPDATE and one DELETE clause, name-aligned " +
        "INSERT, and subquery-free conditions; use the programmatic " +
        "API for anything wider.")

  /** Re-target a resolved expression onto the executor's frame by
    * NAME: target attrs keep their name, source attrs take the
    * `__src_` prefix (keys excepted). Refuses subqueries. */
  private[plans] def nameBased(e: Expression,
      sourceAttrs: AttributeSet,
      keys: Set[String]): Column = {
    if (e.exists(_.isInstanceOf[SubqueryExpression]))
      unsupported("subqueries in DML conditions are not supported")
    GraftColumnBridge.column(e.transform {
      case a: AttributeReference if sourceAttrs.contains(a) =>
        if (keys.contains(a.name)) UnresolvedAttribute.quoted(a.name)
        else UnresolvedAttribute.quoted(s"__src_${a.name}")
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    })
  }

  private[plans] def assignmentName(a: Assignment): String = a.key match {
    case ar: AttributeReference => ar.name
    case other => unsupported(
      s"assignment target $other is not a plain column")
  }

  /** Split the merge condition into same-named equi-key pairs. */
  private[plans] def mergeKeys(cond: Expression,
      targetAttrs: AttributeSet, sourceAttrs: AttributeSet)
      : Seq[String] = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    conjuncts(cond).map {
      case EqualTo(l: AttributeReference, r: AttributeReference)
          if targetAttrs.contains(l) && sourceAttrs.contains(r) &&
            l.name == r.name => l.name
      case EqualTo(l: AttributeReference, r: AttributeReference)
          if targetAttrs.contains(r) && sourceAttrs.contains(l) &&
            l.name == r.name => l.name
      case other => unsupported(
        s"merge condition conjunct $other is not a same-named " +
          "target-source equi-key")
    }
  }

  /** Translate a [[MergeIntoTable]] into the protocol executor's
    * clause form, preserving SQL first-match-wins clause order. */
  private[plans] def translateMerge(spark: SparkSession,
      m: MergeIntoTable, path: String)
      : (org.apache.spark.sql.DataFrame, Seq[String],
         Map[String, Column], Option[Column], Option[Column],
         Boolean, Option[Column]) = {
    if (m.notMatchedBySourceActions.nonEmpty)
      unsupported("WHEN NOT MATCHED BY SOURCE is not supported")
    if (m.withSchemaEvolution)
      unsupported("MERGE WITH SCHEMA EVOLUTION is not supported")
    val targetAttrs = m.targetTable.outputSet
    val sourceAttrs = m.sourceTable.outputSet
    val keys = mergeKeys(m.mergeCondition, targetAttrs, sourceAttrs)
    val keySet = keys.toSet
    def tr(e: Expression): Column = nameBased(e, sourceAttrs, keySet)

    var update: Option[(Map[String, Column], Option[Column])] = None
    var delete: Option[Option[Column]] = None
    var updateBeforeDelete = false
    m.matchedActions.foreach {
      case UpdateAction(cond, assigns, _) =>
        if (update.nonEmpty) unsupported("more than one UPDATE clause")
        update = Some((assigns.map(a =>
          assignmentName(a) -> tr(a.value)).toMap, cond.map(tr)))
        if (delete.isEmpty) updateBeforeDelete = true
      case DeleteAction(cond) =>
        if (delete.nonEmpty) unsupported("more than one DELETE clause")
        delete = Some(cond.map(tr))
      case other => unsupported(s"matched action $other")
    }
    // the executor tests DELETE before UPDATE; SQL is first-match-
    // wins in clause order. With UPDATE listed first, a row matching
    // both conditions must update — guard the delete condition.
    // Three-valued logic: a NULL-evaluating update condition means
    // "update clause NOT taken" (SQL falls through to DELETE), but a
    // bare `base && !NULL` is NULL and the executor's
    // coalesce(delCond, false) would silently KEEP the row — so the
    // guard must coalesce the update condition to false first.
    val deleteCond: Option[Column] = delete.map { condOpt =>
      val base = condOpt.getOrElse(lit(true))
      if (updateBeforeDelete && update.nonEmpty) {
        val updCond = update.get._2.getOrElse(lit(true))
        base && !org.apache.spark.sql.functions.coalesce(
          updCond, lit(false))
      } else base
    }

    var insert = false
    var insertCond: Option[Column] = None
    m.notMatchedActions.foreach {
      case InsertAction(cond, assigns) =>
        if (insert) unsupported("more than one INSERT clause")
        // the executor inserts the source row projected onto the
        // table schema BY NAME — each assignment must be the
        // same-named source column (what INSERT * resolves to)
        assigns.foreach { a =>
          val tgt = assignmentName(a)
          a.value match {
            case ar: AttributeReference
                if sourceAttrs.contains(ar) && ar.name == tgt => ()
            case other => unsupported(
              s"INSERT assignment $tgt = $other is not the " +
                "same-named source column (only name-aligned " +
                "INSERT, e.g. INSERT *, is supported)")
          }
        }
        insert = true
        // the executor applies the insert condition to the RAW source
        // frame (plain column names, no __src_ join renaming); a
        // NOT-MATCHED condition can only reference source columns
        insertCond = cond.map(e =>
          nameBased(e, AttributeSet.empty, Set.empty))
      case other => unsupported(s"not-matched action $other")
    }
    if (update.isEmpty && delete.isEmpty && !insert)
      unsupported("MERGE with no supported clauses")

    val sourceDf = GraftColumnBridge.ofRows(spark, m.sourceTable)
    (sourceDf, keys,
      update.map(_._1).getOrElse(Map.empty),
      update.flatMap(_._2), deleteCond, insert, insertCond)
  }
}

/** `UPDATE t SET … [WHERE …]` → [[CommitLog.update]]: copy-on-write
  * over the touched segments only, CDC-recorded, OCC-retried. */
case class CommitLogUpdateExec(path: String,
    assignments: Seq[Assignment], condition: Option[Expression])
    extends V2CommandExec
    with org.apache.spark.sql.execution.LeafExecNode {

  override def output: Seq[Attribute] = Nil

  override def run(): Seq[InternalRow] = {
    import CommitLogDmlStrategy.{assignmentName, nameBased}
    val spark: SparkSession = session
    def tr(e: Expression): Column =
      nameBased(e, AttributeSet.empty, Set.empty)
    val set = assignments.map(a =>
      assignmentName(a) -> tr(a.value)).toMap
    val pred = condition.map(tr).getOrElse(lit(true))
    CommitLog.update(spark, path, pred, set): Unit
    Seq.empty
  }
}

/** `MERGE INTO t USING s ON … WHEN …` → [[CommitLog.mergeInto]]:
  * duplicate-source-key refusal, delete/update clause-order
  * preserved, bounded copy-on-write, CDC. */
case class CommitLogMergeExec(path: String, merge: MergeIntoTable)
    extends V2CommandExec
    with org.apache.spark.sql.execution.LeafExecNode {

  override def output: Seq[Attribute] = Nil

  override def run(): Seq[InternalRow] = {
    val spark: SparkSession = session
    val (src, keys, upd, updCond, delCond, ins, insCond) =
      CommitLogDmlStrategy.translateMerge(spark, merge, path)
    CommitLog.mergeInto(spark, path, src, keys,
      whenMatchedUpdate = upd,
      whenMatchedUpdateCondition = updCond,
      whenMatchedDelete = delCond,
      whenNotMatchedInsert = ins,
      whenNotMatchedInsertCondition = insCond): Unit
    Seq.empty
  }
}
