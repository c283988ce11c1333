package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  AttributeReference, AttributeSet, GenericInternalRow, JoinedRow,
  RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan,
  SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.functions.{col, lit, struct}

/** Native backward as-of join: the whole-operator tier of the custom-
  * operator ladder (custom `LogicalPlan` + `SparkStrategy` + `SparkPlan`
  * registered through `SparkSessionExtensions`), complementing the
  * expression tier ([[graft.expressions.PolyHashFP]]) and the rule tier
  * ([[graft.expressions.RewritePolyHash]]).
  *
  * The composed implementation ([[graft.operators.AsofJoin]], the
  * reference-scoped operator for SURVEY §2.4 "joins beyond inner/left")
  * is union → one shuffle → one window pass — already the right scale
  * shape. What the built-in operators CANNOT express is the as-of merge
  * without materializing the union relation and running a window
  * `last(ignoreNulls)` over |L|+|R| rows: the window operator buffers
  * per-partition frames and carries the running-payload state through
  * Spark's generic aggregate machinery. This physical operator replaces
  * steps 1–4 with the textbook merge: declare
  * `requiredChildDistribution = ClusteredDistribution(keys)` per side
  * and `requiredChildOrdering = (keys, on)` — EnsureRequirements then
  * plans the exchanges/sorts (so AQE still coalesces/reuses them; the
  * operator composes with the optimizer instead of hand-scheduling) —
  * and the exec is a single O(|L|+|R|) streaming pass per partition
  * holding ONE (key, payload) pair of state, no union row-widening, no
  * window buffer.
  *
  * Semantics (backward mode matches [[graft.operators.AsofJoin.backward]]
  * and DuckDB's `ASOF LEFT JOIN` `<=` convention): for each left row,
  * the payload of the right row with the greatest `on <= left.on` in
  * the same key group; unmatched left rows keep NULL payload. All three
  * merge_asof directions run on the same single pass — `forward` holds
  * the minimal at-or-after tie group as the candidate, `nearest` keeps
  * BOTH O(1) candidate slots and picks the closer (ties → backward) —
  * and `toleranceMicros` bounds the allowed time distance. A NULL `on`
  * (either side) never matches — pinned by AsofNativeSpec. NULL join
  * keys group together (Spark sort semantics), diverging from SQL
  * equality joins — same caveat the sort-merge-join-based composed
  * form has.
  *
  * 100 TB read: ONE exchange per side (the composed form needs a
  * second right-side exchange for its (key, on) tie-break dedup
  * window — here the tie-break rides the demanded sort instead),
  * strictly less memory (no window frame buffer, no union of
  * dissimilar schemas), and the merge state is O(1) per partition.
  * Result-identical row-for-row with the composed operator
  * (AsofNativeSpec pins the multiset equality).
  *
  * Skew caveat: AQE's OptimizeSkewedJoin only recognizes Spark's own
  * join execs, so a pathological hot key concentrates in one task here
  * — exactly as it does in the composed form's per-key window — and
  * must be pre-split upstream (e.g. salt + union the re-as-of of the
  * hot key's slice). Inherent to per-key as-of semantics, not this
  * implementation.
  */
object AsofJoinNative {

  /** DataFrame-level entry; with the default direction it mirrors
    * [[graft.operators.AsofJoin.backward]].
    *
    * Tie handling needs NO pre-dedup pass (the composed form runs a
    * (key, on)-partitioned ROW_NUMBER window first, costing a second
    * right-side exchange): the tie-break rides the demanded child SORT
    * instead. Right ordering is (key, on, tiebreak ASC, payload-struct
    * ASC) and the merge consumes every right row with `on <= left.on`,
    * overwriting held state — so the LAST row in sort order wins, which
    * is exactly the max-tiebreak-then-max-payload winner the composed
    * operator's `.desc`-first-row convention picks. (In forward/nearest
    * modes the same convention applies to the consumed equal-(key, on)
    * tie group.)
    *
    * @param toleranceMicros max allowed time distance (micros; `on`
    *   must be TIMESTAMP or LONG) — pandas merge_asof `tolerance`: the
    *   candidate matches only if within the window, else NULL payload.
    *   For backward that is nullification of the plain as-of result
    *   (any earlier right row is further away — equivalent, which is
    *   how the oracle replays it); for forward/nearest it bounds the
    *   look-ahead/both sides.
    * @param direction "backward" (latest at-or-before, default),
    *   "forward" (earliest at-or-after), or "nearest" (closer of the
    *   two, exact ties → backward — the merge_asof convention).
    * @param allowExactMatches pandas merge_asof's remaining knob:
    *   `false` makes every comparison strict (`<` / `>`), so a right
    *   row at EXACTLY the left time never matches — the point-in-time-
    *   correctness setting for leakage-safe feature joins (the label
    *   timestamp must be strictly after the feature timestamp). */
  def backward(
      left: DataFrame,
      right: DataFrame,
      key: Seq[String],
      on: String,
      payload: Seq[String],
      prefix: String = "asof_",
      rightTiebreak: Option[Column] = None,
      toleranceMicros: Option[Long] = None,
      direction: String = "backward",
      allowExactMatches: Boolean = true): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"direction must be backward|forward|nearest, got $direction")
    val spark = left.sparkSession
    // the operator is unusable on a session whose planner lacks the
    // strategy (getOrCreate can hand back a session built without the
    // extensions) — the live-session hook is idempotent, so register
    // unconditionally rather than fail at planning time
    graft.expressions.GraftExtensions.register(spark)
    val stable: Column =
      if (payload.isEmpty) lit(1)
      else struct(payload.map(col): _*)
    val tieCols = (rightTiebreak.toSeq :+ stable).zipWithIndex
      .map { case (c, i) => c.as(s"__graft_tie_$i") }
    // self-join guard: left and right typically derive from the SAME
    // base relation (events vs its filtered twin) and then share
    // exprIds. The analyzer's DeduplicateRelations only knows Spark's
    // own binary nodes, so mint fresh ids on the right via aliases —
    // otherwise the optimizer resolves right-side references against
    // the left child and mis-prunes.
    val r = right.select(
      (key :+ on).map(c => col(c).as(c)) ++
        payload.map(c => col(c).as(c)) ++ tieCols: _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = r.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not in ${p.output.map(_.name).mkString(",")}"))
    val lKeyAttrs = key.map(attr(lPlan, _))
    val rKeyAttrs = key.map(attr(rPlan, _))
    val (lOnAttr, rOnAttr) = (attr(lPlan, on), attr(rPlan, on))
    // fail fast on key/on type mismatch: the merge compares raw
    // UnsafeRow bytes through orderings built from the LEFT side's
    // types, so e.g. an INT-vs-LONG key would silently compare wrong
    // binary layouts and produce wrong matches instead of erroring
    lKeyAttrs.zip(rKeyAttrs).foreach { case (l, r) =>
      require(l.dataType == r.dataType,
        s"as-of key '${l.name}' type mismatch: left ${l.dataType} vs " +
        s"right ${r.dataType} — cast one side before the join") }
    require(lOnAttr.dataType == rOnAttr.dataType,
      s"as-of `on` column '$on' type mismatch: left ${lOnAttr.dataType} " +
      s"vs right ${rOnAttr.dataType} — cast one side before the join")
    val pay = payload.map(attr(rPlan, _))
    // payloadOut carries FIXED exprIds as a constructor field: a lazy
    // member would mint fresh ids on every optimizer copy and orphan
    // any references bound above the node
    val payOut = pay.map(a =>
      AttributeReference(prefix + a.name, a.dataType, nullable = true)())
    if (toleranceMicros.isDefined || direction == "nearest") {
      val t = lOnAttr.dataType
      require(t == org.apache.spark.sql.types.TimestampType ||
        t == org.apache.spark.sql.types.LongType,
        s"tolerance/nearest need a TIMESTAMP or LONG `on` column, got $t")
    }
    val node = AsofJoinNode(lPlan, rPlan,
      lKeyAttrs, rKeyAttrs, lOnAttr, rOnAttr, pay,
      rPlan.output.filter(_.name.startsWith("__graft_tie_")), payOut,
      toleranceMicros, direction, allowExactMatches)
    val out = GraftColumnBridge.ofRows(spark, node)
    out.select(left.columns.map(col) ++
      payload.map(p => col(prefix + p)): _*)
  }

  /** Skew pre-split for the native as-of: the explicit path AQE cannot
    * provide for a custom exec (OptimizeSkewedJoin only recognizes
    * Spark's own join nodes — the caveat documented in the operator
    * scaladoc). A pathologically hot key otherwise lands its entire
    * left slice in ONE merge task.
    *
    * Mechanics: keys whose LEFT row count exceeds `hotThreshold` are
    * collected (tiny — by definition there can only be a handful of
    * keys above any meaningful threshold) and broadcast. Hot left rows
    * are spread across `nSalts` sub-keys by hashing the `on` value;
    * the hot keys' RIGHT rows are replicated to every salt (the
    * right side of a hot key is replicated ×nSalts, the left side is
    * split — the standard salted-join asymmetry), and the as-of runs
    * on (key, salt). Every left row still sees the full right history
    * of its key, so the result is row-identical to the unsalted join
    * (pinned by AsofNativeSpec's planted-skew law); the hot key's work
    * now occupies nSalts parallel tasks instead of one.
    *
    * Cold keys run the plain native as-of unchanged; the two results
    * union. Costs: one extra count aggregation over the left keys
    * (map-side combined), each side scanned twice (hot/cold split) —
    * worth it exactly when a hot key dominates a stage, the regime
    * this exists for. */
  def saltedBackward(
      left: DataFrame,
      right: DataFrame,
      key: Seq[String],
      on: String,
      payload: Seq[String],
      prefix: String = "asof_",
      rightTiebreak: Option[Column] = None,
      toleranceMicros: Option[Long] = None,
      direction: String = "backward",
      allowExactMatches: Boolean = true,
      nSalts: Int = 16,
      hotThreshold: Long = 2000000L): DataFrame = {
    require(nSalts >= 2, s"nSalts must be >= 2, got $nSalts")
    import org.apache.spark.sql.functions.{broadcast, explode, hash,
      pmod, sequence}
    val keyCols = key.map(col)
    val hot = left.groupBy(keyCols: _*)
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("__n"))
      .filter(col("__n") > hotThreshold)
      .select(keyCols: _*)
    def run(l: DataFrame, r: DataFrame, k: Seq[String]) =
      backward(l, r, k, on, payload, prefix, rightTiebreak,
        toleranceMicros, direction, allowExactMatches)
    // the USING-style anti/semi joins move the key columns to the
    // front — re-select the caller's column order so both branches
    // (and therefore the union) match backward()'s output contract
    val cold = run(
      left.join(broadcast(hot), key, "left_anti")
        .select(left.columns.map(col): _*),
      right.join(broadcast(hot), key, "left_anti")
        .select(right.columns.map(col): _*), key)
    // hot left rows spread by hashing the time value (deterministic,
    // high-cardinality within a hot key); hot right rows replicated to
    // every salt so each sub-key holds the key's FULL history
    val saltedLeft = left.join(broadcast(hot), key, "left_semi")
      .select(left.columns.map(col): _*)
      .withColumn("__salt", pmod(hash(col(on)), lit(nSalts)))
    val saltedRight = right.join(broadcast(hot), key, "left_semi")
      .select(right.columns.map(col): _*)
      .withColumn("__salt",
        explode(sequence(lit(0), lit(nSalts - 1))))
    val hotResult = run(saltedLeft, saltedRight, key :+ "__salt")
      .drop("__salt")
    cold.unionByName(hotResult)
  }
}

/** Logical as-of join node; resolved at construction from analyzed
  * children, so the analyzer sees a fully-resolved binary node. */
case class AsofJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftOn: Attribute,
    rightOn: Attribute,
    payload: Seq[Attribute],
    rightTie: Seq[Attribute],
    payloadOut: Seq[Attribute],
    toleranceMicros: Option[Long] = None,
    direction: String = "backward",
    allowExactMatches: Boolean = true) extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ payloadOut

  /** payloadOut originates here, not from the children. */
  override def producedAttributes: AttributeSet = AttributeSet(payloadOut)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy mapping the logical node 1:1 onto the exec. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsofJoinNode =>
      AsofJoinExec(planLater(n.left), planLater(n.right),
        n.leftKeys, n.rightKeys, n.leftOn, n.rightOn,
        n.payload, n.rightTie, n.payloadOut, n.toleranceMicros,
        n.direction, n.allowExactMatches) :: Nil
    case _ => Nil
  }
}

/** Sort-merge as-of join exec: children are hash-clustered on the key
  * and sorted by (key, on) — both demanded declaratively, so
  * EnsureRequirements/AQE own the exchanges — then each co-partition
  * pair merges in one streaming pass with O(1) held state. */
case class AsofJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftOn: Attribute,
    rightOn: Attribute,
    payload: Seq[Attribute],
    rightTie: Seq[Attribute],
    payloadOut: Seq[Attribute],
    toleranceMicros: Option[Long] = None,
    direction: String = "backward",
    allowExactMatches: Boolean = true) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ payloadOut

  /** payloadOut originates here (mirrors the logical node) — without
    * this the plan renders with the `!` missing-input marker. */
  override def producedAttributes: AttributeSet = AttributeSet(payloadOut)

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  /** Right side additionally sorts by the tie-break columns ASC: the
    * merge overwrites held state per consumed row, so within equal
    * (key, on) the last — maximal — tie row wins. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftOn).map(SortOrder(_, Ascending)),
    ((rightKeys :+ rightOn) ++ rightTie).map(SortOrder(_, Ascending)))

  /** Left rows pass through in order — downstream sorts on (key, on)
    * are elided. */
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftOn).map(SortOrder(_, Ascending))

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext,
      "number of output rows"))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lOnExpr = leftOn
    val rOnExpr = rightOn
    val payloadExprs = payload
    val outExprs = output
    val payOutAttrs = payloadOut
    val keyTypes = leftKeys.map(_.dataType)
    val onType = leftOn.dataType
    val tol = toleranceMicros
    val dir = direction
    val allowExact = allowExactMatches

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyGen = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyGen = UnsafeProjection.create(rKeyExprs, rOut)
      val lOnGen = UnsafeProjection.create(Seq(lOnExpr), lOut)
      val rOnGen = UnsafeProjection.create(Seq(rOnExpr), rOut)
      val payloadGen = UnsafeProjection.create(payloadExprs, rOut)
      val outGen = UnsafeProjection.create(outExprs, lOut ++ payOutAttrs)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val onOrd = RowOrdering.createNaturalAscendingOrdering(Seq(onType))
      val joined = new JoinedRow
      val nullPayload = new GenericInternalRow(payOutAttrs.length)

      new Iterator[InternalRow] {
        private var rHead: InternalRow =
          if (rIter.hasNext) rIter.next() else null
        // The O(1) merge state — two candidate slots:
        //  - b*: BACKWARD candidate, the latest row consumed with
        //    on <= left.on (backward + nearest modes);
        //  - f*: FORWARD candidate, the tie-winner of the MINIMAL
        //    on >= left.on group (forward + nearest modes). The group
        //    is consumed — safe, because by minimality no unconsumed
        //    row has a time inside (left.on, f.on); in nearest mode a
        //    folded f (f.on <= new left.on) BECOMES the backward
        //    candidate before further draining, so nothing is lost.
        private var bKey: UnsafeRow = null
        private var bPayload: UnsafeRow = null
        private var bOn: Long = 0L
        private var fKey: UnsafeRow = null
        private var fPayload: UnsafeRow = null
        private var fOnRow: UnsafeRow = null
        private var fOn: Long = 0L
        // Strict ("allow_exact_matches=false") NEAREST needs a third
        // slot: a right row at EXACTLY the current left time is
        // excluded for THIS left row, but it is the LATEST
        // strictly-before candidate for every later (strictly greater)
        // left time — it can be neither consumed into the backward
        // slot (would poison the current row's candidate) nor
        // discarded (later rows need it). Backward mode leaves such
        // rows unconsumed instead (the stream re-offers them); forward
        // mode discards them (on == L can never satisfy on > L' for
        // L' >= L); only nearest, which consumes past them to reach
        // the forward group, must stash.
        private var eKey: UnsafeRow = null
        private var ePayload: UnsafeRow = null
        private var eOn: Long = 0L
        // nearest needs both candidates' long times; tolerance needs
        // its side's
        private val needLongOn = tol.isDefined || dir == "nearest"

        private def advanceR(): Unit =
          rHead = if (rIter.hasNext) rIter.next() else null

        /** Consume rows with on <= left.on into the backward slot
          * (strict mode: on < left.on; an equal-time row stays
          * unconsumed in backward mode and stashes into the equal slot
          * in nearest mode); stops at the first same-key row past the
          * bound (unconsumed). */
        private def drainBackward(lKey: UnsafeRow, lOn: UnsafeRow): Unit = {
          var advance = rHead != null
          while (advance) {
            val rKey = rKeyGen(rHead)
            val c = keyOrd.compare(rKey, lKey)
            if (c < 0) {
              // right stream is behind this left key — drain
              advanceR(); advance = rHead != null
            } else if (c == 0) {
              val rOn = rOnGen(rHead)
              if (rOn.isNullAt(0)) {
                // NULL right time sorts first, never matches — skip
                advanceR(); advance = rHead != null
              } else {
                val oc = onOrd.compare(rOn, lOn)
                if (oc < 0 || (oc == 0 && allowExact)) {
                  bKey = rKey.copy()
                  bPayload = payloadGen(rHead).copy()
                  // TIMESTAMP and LONG both store a long at ordinal 0
                  if (needLongOn) bOn = rOn.getLong(0)
                  advanceR(); advance = rHead != null
                } else if (oc == 0 && dir == "nearest") {
                  // strict nearest: stash — excluded now, but the
                  // latest strictly-before candidate for later rows
                  eKey = rKey.copy()
                  ePayload = payloadGen(rHead).copy()
                  eOn = rOn.getLong(0)
                  advanceR(); advance = rHead != null
                } else advance = false
              }
            } else advance = false
          }
        }

        /** Capture the minimal on >= left.on tie group (same key) into
          * the forward slot, consuming it; last (max-tie) row wins.
          * Assumes rows with on < left.on were already drained (either
          * into the backward slot or discarded). */
        private def captureForward(lKey: UnsafeRow, lOn: UnsafeRow): Unit = {
          fPayload = null
          var advance = rHead != null
          while (advance) {
            val rKey = rKeyGen(rHead)
            val c = keyOrd.compare(rKey, lKey)
            if (c < 0) { advanceR(); advance = rHead != null }
            else if (c == 0) {
              val rOn = rOnGen(rHead)
              if (rOn.isNullAt(0) || onOrd.compare(rOn, lOn) < 0 ||
                (!allowExact && onOrd.compare(rOn, lOn) == 0)) {
                // behind this left time (or NULL, or AT it in strict
                // mode — on == L can never satisfy on > L' for any
                // later L' >= L): useless for every later left row
                // too — discard (forward-only mode; nearest drains
                // these into the backward/equal slots first)
                advanceR(); advance = rHead != null
              } else {
                fKey = rKey.copy()
                fOnRow = rOn.copy()
                if (needLongOn) fOn = rOn.getLong(0)
                fPayload = payloadGen(rHead).copy()
                advanceR()
                var inGroup = rHead != null
                while (inGroup) {
                  val gKey = rKeyGen(rHead)
                  if (keyOrd.compare(gKey, fKey) == 0) {
                    val gOn = rOnGen(rHead)
                    if (!gOn.isNullAt(0) &&
                      onOrd.compare(gOn, fOnRow) == 0) {
                      fPayload = payloadGen(rHead).copy()
                      advanceR(); inGroup = rHead != null
                    } else inGroup = false
                  } else inGroup = false
                }
                advance = false
              }
            } else advance = false
          }
        }

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val lRow = lIter.next()
          val lKey = lKeyGen(lRow)
          val lOn = lOnGen(lRow)
          if (!lOn.isNullAt(0)) {
            dir match {
              case "backward" => drainBackward(lKey, lOn)
              case "forward" =>
                val fc = if (fPayload != null && fKey.equals(lKey))
                  onOrd.compare(fOnRow, lOn) else -1
                if (!(fc > 0 || (fc == 0 && allowExact)))
                  captureForward(lKey, lOn)
              case _ => // nearest
                // a stashed equal-time row from a strictly earlier
                // left time is now the latest strictly-before
                // candidate — fold the equal slot into backward first
                // (the forward slot, folded next, is always later in
                // right-stream order, so this overwrite order is safe)
                if (ePayload != null && eKey.equals(lKey) &&
                  eOn < lOn.getLong(0)) {
                  bKey = eKey; bPayload = ePayload; bOn = eOn
                  ePayload = null
                }
                // a forward candidate that fell at-or-behind this left
                // row IS the latest on <= left.on so far — fold it
                // (strict mode: strictly-behind folds to backward; AT
                // the left time re-stashes into the equal slot)
                if (fPayload != null && fKey.equals(lKey)) {
                  val fc = onOrd.compare(fOnRow, lOn)
                  if (fc < 0 || (fc == 0 && allowExact)) {
                    bKey = fKey; bPayload = fPayload; bOn = fOn
                    fPayload = null
                  } else if (fc == 0) {
                    eKey = fKey; ePayload = fPayload; eOn = fOn
                    fPayload = null
                  }
                }
                drainBackward(lKey, lOn)
                val fValid = fPayload != null && fKey.equals(lKey) &&
                  onOrd.compare(fOnRow, lOn) > 0
                if (!fValid) captureForward(lKey, lOn)
            }
          }
          val p =
            if (lOn.isNullAt(0)) nullPayload
            else {
              // subtractExact: a raw LONG `on` column with extreme
              // values would otherwise overflow silently and flip the
              // tolerance/nearest decision (fine for TIMESTAMP micros;
              // fail fast for adversarial LONGs)
              val bOk = bPayload != null && bKey.equals(lKey) &&
                tol.forall(t =>
                  Math.subtractExact(lOn.getLong(0), bOn) <= t)
              val fCmpNow =
                if (fPayload != null && fKey.equals(lKey))
                  onOrd.compare(fOnRow, lOn) else -1
              val fOk = (fCmpNow > 0 || (fCmpNow == 0 && allowExact)) &&
                tol.forall(t =>
                  Math.subtractExact(fOn, lOn.getLong(0)) <= t)
              dir match {
                case "backward" => if (bOk) bPayload else nullPayload
                case "forward" => if (fOk) fPayload else nullPayload
                case _ =>
                  if (bOk && fOk) {
                    // tie → backward, the merge_asof convention
                    if (Math.subtractExact(lOn.getLong(0), bOn) <=
                        Math.subtractExact(fOn, lOn.getLong(0)))
                      bPayload
                    else fPayload
                  } else if (bOk) bPayload
                  else if (fOk) fPayload
                  else nullPayload
              }
            }
          numOutputRows += 1
          outGen(joined(lRow, p))
        }
      }
    }
  }
}
