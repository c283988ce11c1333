package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeReference, AttributeSet, EqualTo, Exists, Expression, InSubquery, IsNotNull, ListQuery, Literal, NamedExpression, ScalarSubquery, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Assignment, DeleteAction, DeleteFromTable, Filter, InsertAction, LocalRelation, LogicalPlan, MergeIntoTable, Project, SubqueryAlias, UpdateAction, UpdateTable}
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
  * keys, non-name-aligned INSERT expressions, subqueries in the
  * MERGE ON condition, non-equi-key correlations.
  * Match sides translate as ORDERED clause lists — any number of
  * conditional UPDATE/DELETE clauses, SQL first-match-wins preserved
  * verbatim by the executor's list-order semantics; `WHEN NOT MATCHED
  * BY SOURCE` clauses translate the same way (their conditions
  * reference target columns only — the analyzer enforces that before
  * we see the plan). UPDATE/DELETE WHERE clauses admit subqueries:
  * uncorrelated ones re-plan as semi joins against the executor's
  * frame; equi-key-correlated EXISTS/IN rewrite to guarded
  * uncorrelated INs ([[decorrelate]]); an equi-key-correlated SCALAR
  * aggregate (in SET or WHERE) reroutes the whole statement through
  * the N-clause MERGE executor ([[correlatedScalarDml]]).
  */
object CommitLogDmlStrategy extends SparkStrategy {

  // The executors receive their predicates/assignments ALREADY
  // translated to opaque `Column`s (not Expression constructor args):
  // physical-plan preparation rules (PlanSubqueries) rewrite every
  // Expression argument of a SparkPlan into executable form
  // (InSubqueryExec/SubqueryExec), which cannot be re-applied to the
  // executor's fresh logical frame — a Column is invisible to that
  // traversal, so a carried uncorrelated subquery stays LOGICAL until
  // the executor re-plans it as a semi join.
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case UpdateTable(rel, assignments, condition) =>
      commitLogPath(rel).map { path =>
        // a CORRELATED scalar subquery (`SET v = (SELECT agg(x) FROM s
        // WHERE s.k = t.k)`) cannot ride a per-row Column — it needs a
        // join. The optimizer has already decorrelated it to a
        // key-grouped Aggregate; route the whole statement through the
        // N-clause MERGE executor (source = that Aggregate, unique
        // keys by construction)
        correlatedScalarDml(assignments, condition, isDelete = false)
          .map(sd => CommitLogScalarDmlExec(path, sd) :: Nil)
          .getOrElse {
            val set = assignments.map(a =>
              assignmentName(a) -> nameBased(a.value,
                AttributeSet.empty, Set.empty,
                allowUncorrelatedSubqueries = true)).toMap
            // WHERE and SET admit uncorrelated subqueries (`UPDATE t
            // SET … WHERE id IN (SELECT …)`); correlated EXISTS/IN
            // rewrite to guarded uncorrelated INs inside nameBased
            val pred = condition.map(e => nameBased(e,
                AttributeSet.empty, Set.empty,
                allowUncorrelatedSubqueries = true))
              .getOrElse(lit(true))
            CommitLogUpdateExec(path, set, pred) :: Nil
          }
      }.getOrElse(Nil)
    case m: MergeIntoTable =>
      commitLogPath(m.targetTable).map { path =>
        CommitLogMergeExec(path, m) :: Nil
      }.getOrElse(Nil)
    // DELETE with a condition the V1-filter bridge can't express
    // (subqueries, arithmetic, functions): route through the same
    // copy-on-write executor the translatable shapes reach via
    // `SupportsDelete.deleteWhere` — `DELETE FROM t WHERE id IN
    // (SELECT …)` is a real user's first cleanup statement, and the
    // built-in DSv2 path refuses it. Translatable conditions fall
    // through (Nil) so the existing filter-bridge path keeps serving
    // them unchanged.
    case DeleteFromTable(rel, condition) if !filterBridgeable(condition) =>
      commitLogPath(rel).map { path =>
        correlatedScalarDml(Nil, Some(condition), isDelete = true)
          .map(sd => CommitLogScalarDmlExec(path, sd) :: Nil)
          .getOrElse(CommitLogDeleteExec(path,
            nameBased(condition, AttributeSet.empty, Set.empty,
              allowUncorrelatedSubqueries = true)) :: Nil)
      }.getOrElse(Nil)
    case _ => Nil
  }

  /** True when the built-in DSv2 delete path can serve the condition
    * (the V1 filter bridge covers it: attribute-vs-literal
    * comparisons, IN over literals, null tests, string prefix/suffix/
    * contains, AND/OR/NOT) — then this strategy stays out of the way.
    * Conservative in BOTH directions is safe: a false negative just
    * routes through our own copy-on-write executor (same semantics,
    * same CDC); a false positive reproduces the pre-round-15 loud
    * refusal. */
  private def filterBridgeable(condition: Expression): Boolean = {
    import org.apache.spark.sql.catalyst.expressions._
    def attrLit(l: Expression, r: Expression): Boolean =
      (l.isInstanceOf[AttributeReference] && r.isInstanceOf[Literal]) ||
        (l.isInstanceOf[Literal] && r.isInstanceOf[AttributeReference])
    def ok(e: Expression): Boolean = e match {
      case And(l, r) => ok(l) && ok(r)
      case Or(l, r) => ok(l) && ok(r)
      case Not(c) => ok(c)
      case EqualTo(l, r) => attrLit(l, r)
      case EqualNullSafe(l, r) => attrLit(l, r)
      case GreaterThan(l, r) => attrLit(l, r)
      case GreaterThanOrEqual(l, r) => attrLit(l, r)
      case LessThan(l, r) => attrLit(l, r)
      case LessThanOrEqual(l, r) => attrLit(l, r)
      case In(_: AttributeReference, vs) =>
        vs.forall(_.isInstanceOf[Literal])
      case InSet(_: AttributeReference, _) => true
      case IsNull(_: AttributeReference) => true
      case IsNotNull(_: AttributeReference) => true
      case StartsWith(_: AttributeReference, _: Literal) => true
      case EndsWith(_: AttributeReference, _: Literal) => true
      case Contains(_: AttributeReference, _: Literal) => true
      case Literal(_, org.apache.spark.sql.types.BooleanType) => true
      case _ => false
    }
    ok(condition)
  }

  private def commitLogPath(plan: LogicalPlan): Option[String] =
    plan match {
      case SubqueryAlias(_, child) => commitLogPath(child)
      // the stats relay wraps a pushed-down DV/mapped-table scan in
      // its holder leaf (ScanStatsRelay.scala) — without this unwrap
      // a DML whose target carries a deletion vector falls through
      // to Spark's DataSourceV2Strategy, which throws INTERNAL_ERROR
      // on the unexpected node (order-dependent: only once the relay
      // is registered on the live session)
      case h: graft.plans.ScanStatsHolder => commitLogPath(h.hidden)
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
        "(CommitLog.update/mergeIntoClauses/delete) supports " +
        "equi-key merges with any number of ordered UPDATE/DELETE " +
        "clauses per match side, name-aligned INSERT, and — in " +
        "WHERE clauses, merge clause conditions, and SET values — " +
        "uncorrelated subqueries plus equi-key-correlated EXISTS/IN " +
        "and a single correlated scalar aggregate; use the " +
        "programmatic API for anything wider.")

  /** Re-target a resolved expression onto the executor's frame by
    * NAME: target attrs keep their name, source attrs take the
    * `__src_` prefix (keys excepted). UNCORRELATED subqueries pass
    * through intact when the caller opts in (their inner plans are
    * already resolved and reference nothing outside themselves, so
    * re-analysis against the executor's fresh table frame leaves them
    * untouched and the optimizer plans them as semi/anti joins —
    * never a collect). CORRELATED EXISTS/IN with equi-key correlation
    * first rewrite to GUARDED uncorrelated INs ([[decorrelate]]) —
    * their former outer references become plain target attrs that
    * rebind by name like any other; correlated scalars (handled at
    * statement level via the MERGE rewrite) and non-equi correlations
    * refuse loudly. */
  private[plans] def nameBased(e: Expression,
      sourceAttrs: AttributeSet,
      keys: Set[String],
      allowUncorrelatedSubqueries: Boolean = false): Column = {
    val d = if (allowUncorrelatedSubqueries) decorrelate(e) else e
    d.foreach {
      case s: SubqueryExpression =>
        if (!allowUncorrelatedSubqueries)
          unsupported("subqueries in DML conditions are not supported")
        if (s.isCorrelated)
          unsupported("this correlated subquery shape is not " +
            "supported (supported: equi-key-correlated EXISTS/IN " +
            "predicates and a single equi-key-correlated scalar " +
            "aggregate per statement); rewrite the correlation as " +
            "same-column equalities or use the programmatic API " +
            "with an explicit join")
      case _ => ()
    }
    GraftColumnBridge.column(d.transform {
      case a: AttributeReference if sourceAttrs.contains(a) =>
        if (keys.contains(a.name)) UnresolvedAttribute.quoted(a.name)
        else UnresolvedAttribute.quoted(s"__src_${a.name}")
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    })
  }

  /** Split a PULLED-UP correlation condition (the optimizer's
    * PullupCorrelatedPredicates has already moved it from the inner
    * plan's Filters onto the SubqueryExpression's `joinCond`, leaving
    * the inner plan self-contained) into (inner key expr, outer key
    * expr) pairs. None when any conjunct is not an equality cleanly
    * split between the two sides — the caller refuses loudly. */
  private def equiCorrelation(joinCond: Seq[Expression],
      inner: LogicalPlan)
      : Option[Seq[(Expression, Expression)]] = {
    val out = inner.outputSet
    def innerSide(x: Expression) =
      x.references.nonEmpty && x.references.subsetOf(out)
    def outerSide(x: Expression) =
      x.references.nonEmpty && x.references.intersect(out).isEmpty
    val pairs = joinCond.map {
      case EqualTo(l, r) if innerSide(l) && outerSide(r) => Some((l, r))
      case EqualTo(l, r) if outerSide(l) && innerSide(r) => Some((r, l))
      case _ => None
    }
    if (pairs.nonEmpty && pairs.forall(_.isDefined)) Some(pairs.flatten)
    else None
  }

  /** Rewrite equi-key-correlated EXISTS / IN predicates into
    * uncorrelated forms the executor's frame plans WITHOUT a
    * nested-loop join in EITHER polarity:
    *
    *   EXISTS(… ⋈ s.k = t.k)  →
    *       COALESCE((t.k) IN (SELECT s.k … WHERE s.k IS NOT NULL),
    *                FALSE)
    *   a IN (SELECT x … ⋈ s.k = t.k)  →  t.k IS NOT NULL AND
    *       (a, t.k) IN (SELECT x, s.k … WHERE s.k IS NOT NULL)
    *
    * The EXISTS replacement is exactly TWO-valued (EXISTS never
    * yields NULL: a NULL outer key never equi-matches → the IN yields
    * NULL-or-FALSE, COALESCE maps both to FALSE; inner NULL keys are
    * filtered so the list contributes no other NULL source), so
    * `NOT EXISTS` and arbitrary AND/OR/NOT nesting translate verbatim
    * — none of NOT IN's null treachery. The COALESCE wrapper (rather
    * than an `IsNotNull(k) AND …` guard, which is semantically
    * identical here) is a deliberate PLANNING choice: a guard-form IN
    * under NOT plans as a null-aware anti join Spark can only run as
    * a BroadcastNestedLoopJoin (measured: 35 s on a 150k×15k
    * `DELETE WHERE NOT EXISTS` frame — and the DML executors evaluate
    * both polarities of every predicate, kept = NOT matched), while
    * the coalesce form plans a hash join in either polarity (2.1 s
    * same frame).
    *
    * For the correlated IN, the guard + inner key filter preserve the
    * exact THREE-valued result (extra non-matching key rows
    * contribute FALSE to the OR-fold — neutral; a NULL outer key
    * means the original's list was empty → FALSE, the guard's value).
    * Non-equi correlations pass through untouched → the caller's
    * refusal names them. */
  private def decorrelate(e: Expression): Expression = e.transformUp {
    case ex: Exists if ex.isCorrelated =>
      equiCorrelation(ex.joinCond, ex.plan).map { pairs =>
        org.apache.spark.sql.catalyst.expressions.Coalesce(Seq(
          uncorrelatedIn(Nil, pairs, ex.plan, Nil), Literal(false)))
      }.getOrElse(ex)
    case in @ InSubquery(values, lq) if lq.isCorrelated =>
      equiCorrelation(lq.joinCond, lq.plan).map { pairs =>
        val outerKeys = pairs.map(_._2)
        val guard = outerKeys.map(IsNotNull(_): Expression).reduce(And)
        And(guard, uncorrelatedIn(values, pairs, lq.plan,
          lq.plan.output.take(lq.numCols)))
      }.getOrElse(in)
  }

  /** Null-filter the inner plan on its correlation keys and project
    * them (aliased when not plain attrs). */
  private def innerKeyProjection(
      pairs: Seq[(Expression, Expression)], inner: LogicalPlan,
      originalCols: Seq[Attribute]): Project = {
    val innerKeys = pairs.map(_._1)
    val filtered = Filter(
      innerKeys.map(IsNotNull(_): Expression).reduce(And), inner)
    val keyNamed: Seq[NamedExpression] = innerKeys.map {
      case a: Attribute => a
      case other => Alias(other, "__corr_key")()
    }
    Project(originalCols ++ keyNamed, filtered)
  }

  /** `(originalValues ++ outerKeys) IN (originalCols ++ innerKeys)`,
    * inner keys null-filtered, as an uncorrelated ListQuery. */
  private def uncorrelatedIn(values: Seq[Expression],
      pairs: Seq[(Expression, Expression)], inner: LogicalPlan,
      originalCols: Seq[Attribute]): Expression = {
    val outerKeys = pairs.map(_._2)
    val proj = innerKeyProjection(pairs, inner, originalCols)
    InSubquery(values ++ outerKeys,
      ListQuery(proj, Seq.empty, NamedExpression.newExprId,
        proj.output.length, Seq.empty, None))
  }

  /** An UPDATE/DELETE whose SET/WHERE carries ONE equi-key-correlated
    * scalar aggregate, with everything the MERGE rewrite needs. The
    * raw expressions hide inside this wrapper (not Expression-typed
    * fields of the SparkPlan) so physical-plan preparation rules
    * (PlanSubqueries) can't rewrite the carried subquery plan into a
    * non-re-plannable executable form — same shielding rationale as
    * the Column pre-translation above. */
  private[plans] case class ScalarDml(
      scalar: ScalarSubquery,
      innerKeys: Seq[Attribute],
      outerKeys: Seq[AttributeReference],
      scalarOut: Attribute,
      assignments: Seq[(String, Expression)],
      condition: Option[Expression],
      isDelete: Boolean)

  /** Detect + validate a correlated-scalar DML statement. None when
    * no correlated scalar occurs (the plain Column paths serve it);
    * loud refusal when one occurs in an unsupported shape.
    *
    * The optimizer's PullupCorrelatedPredicates has ALREADY
    * decorrelated the subquery to `Aggregate(correlation keys,
    * [value, keys…], child)` with the key equalities on `joinCond` —
    * exactly the unique-keyed source frame [[CommitLog
    * .mergeIntoClauses]] wants: matched target rows take the
    * aggregate value, NOT-MATCHED-BY-SOURCE rows take the aggregate's
    * EMPTY-GROUP value (count → 0, max/sum/avg → NULL — evaluated,
    * not guessed, in the exec), reproducing the original per-row
    * subquery semantics including the COUNT bug. */
  private[plans] def correlatedScalarDml(assignments: Seq[Assignment],
      condition: Option[Expression], isDelete: Boolean)
      : Option[ScalarDml] = {
    val exprs = assignments.map(_.value) ++ condition.toSeq
    val scalars = exprs.flatMap(_.collect {
      case s: ScalarSubquery if s.isCorrelated => s
    })
    if (scalars.isEmpty) return None
    if (scalars.map(_.exprId).distinct.size > 1)
      unsupported("more than one correlated scalar subquery per " +
        "statement")
    val sc = scalars.head
    val pairs = equiCorrelation(sc.joinCond, sc.plan).getOrElse(
      unsupported("correlated scalar subquery whose correlation is " +
        "not a conjunction of equalities"))
    val agg = sc.plan match {
      case a: Aggregate => a
      case other => unsupported("correlated scalar subquery did not " +
        s"decorrelate to a key-grouped aggregate (got ${other.nodeName})")
    }
    val innerKeys = pairs.map(_._1).map {
      case a: Attribute => a
      case other => unsupported(
        s"correlated scalar inner key $other is not a plain column")
    }
    val outerKeys = pairs.map(_._2).map {
      case a: AttributeReference => a
      case other => unsupported(
        s"correlated scalar outer key $other is not a plain target " +
          "column")
    }
    if (!innerKeys.forall(k => agg.outputSet.contains(k)))
      unsupported("correlated scalar aggregate does not expose its " +
        "correlation keys")
    val valueCols = agg.output.filterNot(a =>
      innerKeys.exists(_.exprId == a.exprId))
    if (valueCols.size != 1)
      unsupported("correlated scalar aggregate must produce exactly " +
        s"one value column (got ${valueCols.mkString(", ")})")
    if (outerKeys.map(_.name).distinct.size != outerKeys.size)
      unsupported("correlated scalar correlation repeats a target " +
        "column")
    Some(ScalarDml(sc, innerKeys, outerKeys, valueCols.head,
      assignments.map(a => assignmentName(a) -> a.value), condition,
      isDelete))
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

  /** One match side's actions → the executor's ORDERED clause list —
    * SQL first-match-wins is the executor's own list-order semantics,
    * so any number of conditional UPDATE/DELETE clauses translate
    * verbatim. */
  private[plans] def clauseList(
      actions: Seq[org.apache.spark.sql.catalyst.plans.logical
        .MergeAction],
      tr: Expression => Column, side: String)
      : Seq[CommitLog.MergeClause] =
    actions.map {
      case UpdateAction(cond, assigns, _) =>
        CommitLog.MergeUpdate(assigns.map(a =>
          assignmentName(a) -> tr(a.value)).toMap, cond.map(tr))
      case DeleteAction(cond) => CommitLog.MergeDelete(cond.map(tr))
      case other => unsupported(s"$side action $other")
    }

  /** Translated MERGE clauses in the protocol executor's form. */
  private[plans] case class TranslatedMerge(
      source: org.apache.spark.sql.DataFrame, keys: Seq[String],
      matched: Seq[CommitLog.MergeClause],
      insert: Boolean, insertCond: Option[Column],
      notMatchedBySource: Seq[CommitLog.MergeClause])

  /** Translate a [[MergeIntoTable]] into the protocol executor's
    * clause form, preserving SQL first-match-wins clause order. */
  private[plans] def translateMerge(spark: SparkSession,
      m: MergeIntoTable, path: String): TranslatedMerge = {
    // WITH SCHEMA EVOLUTION needs no handling here: by planning time
    // the analyzer has already applied the schema delta through the
    // catalog's alterTable (CommitLogTable declares
    // AUTOMATIC_SCHEMA_EVOLUTION) and re-resolved the MERGE against
    // the evolved table — the executor reads the fresh snapshot and
    // sees the new columns like any other.
    val targetAttrs = m.targetTable.outputSet
    val sourceAttrs = m.sourceTable.outputSet
    val keys = mergeKeys(m.mergeCondition, targetAttrs, sourceAttrs)
    val keySet = keys.toSet
    // clause conditions and SET values admit subqueries (round 16):
    // uncorrelated ones pass through; equi-key-correlated EXISTS/IN
    // decorrelate like the DELETE/UPDATE predicates. The executor
    // evaluates clause conditions inside coalesce-wrapped projections
    // (fireIndex), so they plan as hash joins in either polarity.
    def tr(e: Expression): Column = nameBased(e, sourceAttrs, keySet,
      allowUncorrelatedSubqueries = true)

    val matchedClauses = clauseList(m.matchedActions, tr, "matched")
    // NOT MATCHED BY SOURCE: same clause shapes; conditions/SET
    // values reference target columns only (analyzer-enforced), so
    // the same name-based translation applies — source attrs simply
    // don't occur
    val nmbsClauses = clauseList(m.notMatchedBySourceActions, tr,
      "not-matched-by-source")

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
          nameBased(e, AttributeSet.empty, Set.empty,
            allowUncorrelatedSubqueries = true))
      case other => unsupported(s"not-matched action $other")
    }
    if (matchedClauses.isEmpty && !insert && nmbsClauses.isEmpty)
      unsupported("MERGE with no supported clauses")

    val sourceDf = GraftColumnBridge.ofRows(spark, m.sourceTable)
    TranslatedMerge(sourceDf, keys, matchedClauses,
      insert, insertCond, nmbsClauses)
  }
}

/** `UPDATE t SET … [WHERE …]` → [[CommitLog.update]]: copy-on-write
  * over the touched segments only, CDC-recorded, OCC-retried. The
  * strategy pre-translated the clauses to Columns (opaque to plan-
  * preparation expression rewrites — see the strategy note). */
case class CommitLogUpdateExec(path: String,
    set: Map[String, Column], pred: Column)
    extends V2CommandExec
    with org.apache.spark.sql.execution.LeafExecNode {

  override def output: Seq[Attribute] = Nil

  override def run(): Seq[InternalRow] = {
    CommitLog.update(session, path, pred, set): Unit
    Seq.empty
  }
}

/** `DELETE FROM t WHERE <non-filter-bridgeable>` (subqueries,
  * arithmetic, functions) → [[CommitLog.delete]]: the same bounded
  * copy-on-write + CDC + OCC path `SupportsDelete.deleteWhere` feeds
  * for translatable filters; the predicate (uncorrelated subqueries
  * included) is re-applied to the executor's table frame, where the
  * optimizer plans IN/EXISTS as semi joins. */
case class CommitLogDeleteExec(path: String, pred: Column)
    extends V2CommandExec
    with org.apache.spark.sql.execution.LeafExecNode {

  override def output: Seq[Attribute] = Nil

  override def run(): Seq[InternalRow] = {
    CommitLog.delete(session, path, pred): Unit
    Seq.empty
  }
}

/** `UPDATE t SET v = (SELECT agg(x) FROM s WHERE s.k = t.k) …` /
  * `DELETE FROM t WHERE … (SELECT agg(x) … WHERE s.k = t.k) …` →
  * [[CommitLog.mergeIntoClauses]]: source = the optimizer's
  * decorrelated key-grouped aggregate (unique keys by construction —
  * the duplicate-source refusal is satisfied structurally), matched
  * rows evaluate the statement with the aggregate value
  * (`__src___scalar`), NOT-MATCHED-BY-SOURCE rows with the
  * aggregate's EMPTY-GROUP value — the exact per-row subquery
  * semantics (a target row with no matching source rows sees
  * count=0 / max=NULL), distributed as one bounded copy-on-write
  * merge instead of a per-row subquery. */
case class CommitLogScalarDmlExec(path: String,
    dml: CommitLogDmlStrategy.ScalarDml)
    extends V2CommandExec
    with org.apache.spark.sql.execution.LeafExecNode {

  override def output: Seq[Attribute] = Nil

  override def run(): Seq[InternalRow] = {
    val spark: SparkSession = session
    val d = dml
    val agg = d.scalar.plan.asInstanceOf[Aggregate]
    // the value the ORIGINAL subquery yields for a row with no match:
    // the same aggregate evaluated globally over EMPTY input
    val valueNamed = agg.aggregateExpressions
      .find(_.toAttribute.exprId == d.scalarOut.exprId)
      .getOrElse(throw new IllegalStateException(
        "correlated scalar DML: aggregate lost its value column"))
    val emptyAgg = Aggregate(Seq.empty, Seq(valueNamed),
      LocalRelation(agg.child.output))
    val defaultValue = GraftColumnBridge.ofRows(spark, emptyAgg)
      .collect()(0).get(0)
    val default = Literal.create(defaultValue, d.scalarOut.dataType)
    // NULL source keys can never equi-match the correlation — drop
    // their groups so no merge-join null handling can resurrect them
    val srcName = "__scalar"
    val keyCols = d.innerKeys.zip(d.outerKeys).map { case (ik, ok) =>
      GraftColumnBridge.column(ik).as(ok.name)
    }
    val source = GraftColumnBridge.ofRows(spark, agg)
      .select(keyCols :+
        GraftColumnBridge.column(d.scalarOut).as(srcName): _*)
      .filter(d.outerKeys.map(k =>
        org.apache.spark.sql.functions.col(k.name).isNotNull)
        .reduce(_ && _))
    def subst(e: Expression, repl: Expression): Expression =
      e.transform {
        case s: ScalarSubquery if s.exprId == d.scalar.exprId => repl
      }
    val srcRef = UnresolvedAttribute.quoted(s"__src_$srcName")
    def tr(e: Expression, repl: Expression): Column =
      CommitLogDmlStrategy.nameBased(subst(e, repl),
        AttributeSet.empty, Set.empty,
        allowUncorrelatedSubqueries = true)
    val (matched, nmbs) =
      if (d.isDelete) {
        val cond = d.condition.getOrElse(
          throw new IllegalStateException(
            "correlated scalar DELETE without a condition"))
        (Seq(CommitLog.MergeDelete(Some(tr(cond, srcRef)))),
          Seq(CommitLog.MergeDelete(Some(tr(cond, default)))))
      } else {
        (Seq(CommitLog.MergeUpdate(
          d.assignments.map { case (n, v) => n -> tr(v, srcRef) }.toMap,
          d.condition.map(tr(_, srcRef)))),
          Seq(CommitLog.MergeUpdate(
            d.assignments.map { case (n, v) => n -> tr(v, default) }.toMap,
            d.condition.map(tr(_, default)))))
      }
    CommitLog.mergeIntoClauses(spark, path, source,
      d.outerKeys.map(_.name), matched = matched,
      notMatchedInsert = false, notMatchedBySource = nmbs): Unit
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
    val t = CommitLogDmlStrategy.translateMerge(spark, merge, path)
    CommitLog.mergeIntoClauses(spark, path, t.source, t.keys,
      matched = t.matched,
      notMatchedInsert = t.insert,
      notMatchedInsertCondition = t.insertCond,
      notMatchedBySource = t.notMatchedBySource): Unit
    Seq.empty
  }
}
