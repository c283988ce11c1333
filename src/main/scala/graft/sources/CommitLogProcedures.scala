package graft.sources

import java.util.Collections

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._

/** SQL stored procedures for the commit-log lifecycle — the
  * `CALL cat.system.<proc>(...)` surface (Spark 4's ProcedureCatalog,
  * the public pattern Iceberg ships its OPTIMIZE/maintenance verbs
  * through, since Spark's parser has no OPTIMIZE/VACUUM statements):
  *
  * {{{
  *   CALL cat.system.compact(table => 'ns.t', target_rows => 100000)
  *   CALL cat.system.optimize_cluster(table => 'ns.t',
  *     cluster_by => 'l_shipdate,l_orderkey', segments => 8,
  *     stats_by => 'l_shipdate')
  *   CALL cat.system.optimize_zorder(table => 'ns.t', x => 'p',
  *     y => 's', tie_break => 'id', segments => 16)
  *   CALL cat.system.optimize_bucket(table => 'ns.t', keys => 'id',
  *     buckets => 8)
  *   CALL cat.system.vacuum(table => 'ns.t', retain => 2)
  *   CALL cat.system.restore(table => 'ns.t', version => 3)
  *   CALL cat.system.clone_table(source => 'ns.t', target => 'ns.u')
  * }}}
  *
  * Each returns its committed version as a one-row result. Column
  * lists are comma-separated strings (`a,b,c`). Table references are
  * `namespace.table` under the owning catalog's root — the same
  * resolution every other surface uses. */
private[sources] object CommitLogProcedures {

  private def spark: SparkSession = SparkSession.active

  private val names = Seq("compact", "optimize_cluster",
    "optimize_zorder", "optimize_bucket", "optimize_grid",
    "optimize_incremental", "optimize_zorder_nd",
    "vacuum", "restore", "clone_table", "delete_vectored",
    "update_vectored", "attach_blooms", "checkpoint", "fsck",
    "fsck_repair", "set_partition_spec", "maintenance_plan",
    "detail", "vacuum_plan")

  def list: Seq[String] = names

  def load(catalog: CommitLogCatalog, name: String)
      : Option[UnboundProcedure] = {
    def path(ref: String): String = catalog.locationOf(ref)
    def cols(s: String): Seq[String] =
      s.split(',').map(_.trim).filter(_.nonEmpty).toSeq
    name.toLowerCase match {
      case "compact" => Some(proc("compact",
        Seq(in("table", StringType),
          in("target_rows", LongType, Some("1048576"))),
        row => CommitLog.compact(spark, path(str(row, 0)),
          targetRowsPerFile = row.getLong(1))))
      case "optimize_cluster" => Some(proc("optimize_cluster",
        Seq(in("table", StringType), in("cluster_by", StringType),
          in("segments", IntegerType),
          in("stats_by", StringType, Some("NULL"))),
        row => {
          val cluster = cols(str(row, 1))
          val stats = if (row.isNullAt(3)) cluster else cols(str(row, 3))
          CommitLogStats.compactClustered(spark, path(str(row, 0)),
            cluster, row.getInt(2), stats)
        }))
      case "optimize_zorder" => Some(proc("optimize_zorder",
        Seq(in("table", StringType), in("x", StringType),
          in("y", StringType), in("tie_break", StringType),
          in("segments", IntegerType),
          in("stats_by", StringType, Some("NULL"))),
        row => {
          val (x, y) = (str(row, 1), str(row, 2))
          val stats = if (row.isNullAt(5)) Seq(x, y) else cols(str(row, 5))
          CommitLogStats.compactZOrder(spark, path(str(row, 0)), x, y,
            cols(str(row, 3)), row.getInt(4), stats)
        }))
      // N-dimensional morton OPTIMIZE (columns => 'a,b,c'); bits = 0
      // picks the largest per-dim budget keeping the key a positive
      // Long (62 / n)
      case "optimize_zorder_nd" => Some(proc("optimize_zorder_nd",
        Seq(in("table", StringType), in("columns", StringType),
          in("tie_break", StringType), in("segments", IntegerType),
          in("stats_by", StringType, Some("NULL")),
          in("bits", IntegerType, Some("0"))),
        row => {
          val zc = cols(str(row, 1))
          val stats = if (row.isNullAt(4)) zc else cols(str(row, 4))
          CommitLogStats.compactZOrderN(spark, path(str(row, 0)), zc,
            cols(str(row, 2)), row.getInt(3), stats, row.getInt(5))
        }))
      // rewrite only the unsorted tail (O(new data) maintenance);
      // no-op at the depth-2 steady state — returns the current
      // version then
      case "optimize_incremental" => Some(proc("optimize_incremental",
        Seq(in("table", StringType), in("cluster_by", StringType),
          in("target_rows", LongType, Some("1048576")),
          in("stats_by", StringType, Some("NULL"))),
        row => {
          val cluster = cols(str(row, 1))
          val stats = if (row.isNullAt(3)) cluster else cols(str(row, 3))
          CommitLogStats.compactClusteredIncremental(spark,
            path(str(row, 0)), cluster, row.getLong(2), stats)._1
        }))
      case "optimize_bucket" => Some(proc("optimize_bucket",
        Seq(in("table", StringType), in("keys", StringType),
          in("buckets", IntegerType),
          in("stats_by", StringType, Some("NULL"))),
        row => {
          val keys = cols(str(row, 1))
          val stats = if (row.isNullAt(3)) keys else cols(str(row, 3))
          CommitLogStats.compactBucketed(spark, path(str(row, 0)),
            keys, row.getInt(2), stats)
        }))
      // migrate a LEGACY composite multi-key bucket record to the
      // per-key grid form that claims storage-partitioned joins;
      // no-op (current version) when the layout already claims
      case "optimize_grid" => Some(proc("optimize_grid",
        Seq(in("table", StringType),
          in("stats_by", StringType, Some("NULL"))),
        row => {
          val stats = if (row.isNullAt(1)) None else Some(cols(str(row, 1)))
          CommitLogStats.migrateToGrid(spark, path(str(row, 0)), stats)
        }))
      case "vacuum" => Some(proc("vacuum",
        Seq(in("table", StringType),
          in("retain", IntegerType, Some("2"))),
        row => {
          val p = path(str(row, 0))
          CommitLog.vacuum(spark, p, retainVersions = row.getInt(1))
          CommitLog.currentVersion(spark, p).getOrElse(0L)
        }))
      // force a full-state checkpoint at the current version — the
      // operational knob for read-heavy tables between cadence hits
      // (resolution then reads ONE file until the next commit)
      case "checkpoint" => Some(proc("checkpoint",
        Seq(in("table", StringType)),
        row => CommitLog.checkpoint(spark, path(str(row, 0)))))
      // validate the table tree against the on-disk spec (FORMAT.md
      // §8) — findings as rows, zero rows = fully conformant. deep
      // runs the distributed per-segment pass (existence, data
      // files, sidecar grammar); the CALL surface collects at most
      // 10k findings (an incident dump, not a data path — use
      // CommitLogFsck.fsck directly for an unbounded DataFrame)
      case "fsck" => Some(procFindings("fsck",
        Seq(in("table", StringType),
          in("deep", BooleanType, Some("true"))),
        Seq("level", "code", "object", "detail"),
        row => CommitLogFsck.fsck(spark, path(str(row, 0)),
          deep = row.getBoolean(1))))
      // FSCK REPAIR: one transactional commit dropping the current
      // version's references to missing segments/DVs (never touching
      // live data); refuses on non-reference-droppable corruption.
      // dry_run reports the would-be actions without committing.
      case "fsck_repair" => Some(procFindings("fsck_repair",
        Seq(in("table", StringType),
          in("dry_run", BooleanType, Some("false"))),
        Seq("action", "object", "detail"),
        row => CommitLogFsck.repair(spark, path(str(row, 0)),
          dryRun = row.getBoolean(1))))
      // the maintenance advisor: what to run on this table, as
      // (action, reason, command) rows — empty = healthy. Thresholds
      // ride the defaults; schedulers needing different ones call
      // CommitLogMaintenance.maintenancePlan directly.
      case "maintenance_plan" => Some(procFindings("maintenance_plan",
        Seq(in("table", StringType)),
        Seq("action", "reason", "command"),
        row => CommitLogMaintenance.maintenancePlan(spark,
          path(str(row, 0)))))
      // DESCRIBE DETAIL through CALL (Delta's typed one-row summary
      // for SQL-only users — the programmatic CommitLog.detail is the
      // same frame): segment/file/byte counts, DV state, sidecar
      // coverage, partition + bucket layout, all from metadata
      case "detail" => Some(procTyped("detail",
        Seq(in("table", StringType)),
        row => CommitLog.detail(spark, path(str(row, 0)))))
      // VACUUM dry run through CALL: exactly what the retention floor
      // would remove, as (category, object) rows — vacuum executes
      // this same plan; zero rows = nothing to sweep
      case "vacuum_plan" => Some(procFindings("vacuum_plan",
        Seq(in("table", StringType),
          in("retain", IntegerType, Some("2"))),
        Seq("category", "object"),
        row => {
          val s = spark
          import s.implicits._
          val (segs, changes, dvs, droppedVs) = CommitLog.vacuumPlan(
            s, path(str(row, 0)), retainVersions = row.getInt(1))
          (segs.map(("orphan_or_dropped_segment", _)) ++
            changes.map(("dead_change_record", _)) ++
            dvs.map(("dead_deletion_vector", _)) ++
            droppedVs.map(v => ("dropped_version", v.toString)))
            .toDF("category", "object")
        }))
      // partition evolution (Iceberg's capability, metadata-only
      // here because partition pruning is sidecar pruning): rewrites
      // the recorded spec going forward; '' = unpartitioned
      case "set_partition_spec" => Some(proc("set_partition_spec",
        Seq(in("table", StringType), in("partition_by", StringType)),
        row => CommitLog.setPartitionSpec(spark, path(str(row, 0)),
          cols(str(row, 1)))))
      case "restore" => Some(proc("restore",
        Seq(in("table", StringType), in("version", LongType)),
        row => CommitLog.restore(spark, path(str(row, 0)),
          row.getLong(1))))
      // zero-copy adoption of an existing plain-parquet directory:
      // the v1 manifest references the source in place; stats_columns
      // optionally backfills a sidecar so the table is born prunable
      case "convert_parquet" => Some(proc("convert_parquet",
        Seq(in("source", StringType), in("table", StringType),
          in("stats_columns", StringType, Some("''"))),
        row => CommitLog.convertParquet(spark, str(row, 0),
          path(str(row, 1)), cols(str(row, 2)))))
      // shallow (default) = zero-copy manifest reference; deep
      // copies segment bytes + sidecars on executors and rewrites
      // the DV with remapped paths — see CommitLogClone
      case "clone_table" => Some(proc("clone_table",
        Seq(in("source", StringType), in("target", StringType),
          in("shallow", BooleanType, Some("true"))),
        row => CommitLog.cloneTable(spark, path(str(row, 0)),
          path(str(row, 1)), shallow = row.getBoolean(2))))
      // merge-on-read DELETE: records a deletion vector instead of
      // rewriting touched segments (DELETE FROM stays copy-on-write);
      // `where` is a SQL boolean expression over the table's columns
      case "delete_vectored" => Some(proc("delete_vectored",
        Seq(in("table", StringType), in("where", StringType),
          in("max_dv_rows", LongType, Some("10000000"))),
        row => CommitLog.deleteVectored(spark, path(str(row, 0)),
          org.apache.spark.sql.functions.expr(str(row, 1)),
          maxDvRows = row.getLong(2))._1))
      // merge-on-read UPDATE (`UPDATE … SET` through the strategy
      // stays copy-on-write); `set` is `col = expr, col2 = expr2` —
      // split on top-level commas, each side a SQL expression
      case "update_vectored" => Some(proc("update_vectored",
        Seq(in("table", StringType), in("where", StringType),
          in("set", StringType),
          in("max_dv_rows", LongType, Some("10000000"))),
        row => {
          val assignments = splitTop(str(row, 2)).map { a =>
            val i = a.indexOf('=')
            require(i > 0, s"update_vectored: assignment '$a' is " +
              "not 'column = expression'")
            a.substring(0, i).trim ->
              org.apache.spark.sql.functions.expr(a.substring(i + 1))
          }.toMap
          CommitLog.updateVectored(spark, path(str(row, 0)),
            org.apache.spark.sql.functions.expr(str(row, 1)),
            assignments, maxDvRows = row.getLong(3))._1
        }))
      // bloom-sidecar backfill (point-lookup skipping): returns the
      // CURRENT version — the sidecars are additive metadata, no
      // commit happens
      case "attach_blooms" => Some(proc("attach_blooms",
        Seq(in("table", StringType), in("columns", StringType),
          in("fpp", DoubleType, Some("0.000001"))),
        row => {
          val p = path(str(row, 0))
          CommitLogStats.attachBlooms(spark, p, cols(str(row, 1)),
            row.getDouble(2)): Unit
          CommitLog.currentVersion(spark, p).getOrElse(0L)
        }))
      case _ => None
    }
  }

  private def str(row: InternalRow, i: Int): String =
    row.getUTF8String(i).toString

  /** Split on commas OUTSIDE parentheses/quotes, so a SET list like
    * `a = f(x, y), b = 'v,w'` parses as two assignments. */
  private def splitTop(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    var quote: Option[Char] = None
    var escaped = false
    s.foreach { ch =>
      quote match {
        case Some(q) =>
          cur.append(ch)
          if (escaped) escaped = false
          else if (ch == '\\') escaped = true
          else if (ch == q) quote = None
        case None => ch match {
          case '\'' | '"' => quote = Some(ch); cur.append(ch)
          case '(' => depth += 1; cur.append(ch)
          case ')' => depth -= 1; cur.append(ch)
          case ',' if depth == 0 =>
            out += cur.result(); cur.clear()
          case _ => cur.append(ch)
        }
      }
    }
    if (cur.nonEmpty) out += cur.result()
    out.map(_.trim).filter(_.nonEmpty).toSeq
  }

  private def in(name: String, dt: DataType,
      default: Option[String] = None): ProcedureParameter = {
    val b = ProcedureParameter.in(name, dt)
    default.foreach(b.defaultValue)
    b.build()
  }

  /** Multi-row all-string result through a LocalScan — the
    * diagnostic-procedure shape ([[CommitLogFsck]] findings,
    * [[CommitLogMaintenance]] recommendations). Capped at 10k rows:
    * CALL results land on the driver by design (LocalScan), so a
    * catastrophically broken tree reports its first 10k findings
    * instead of OOMing the session. */
  private def procFindings(procName: String,
      params: Seq[ProcedureParameter], outCols: Seq[String],
      body: InternalRow => org.apache.spark.sql.DataFrame)
      : UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = procName
      override def description(): String =
        s"commitlog diagnostic procedure $procName"
      override def bind(inputType: StructType): BoundProcedure =
        new BoundProcedure {
          override def name(): String = procName
          override def description(): String =
            s"commitlog diagnostic procedure $procName"
          override def parameters(): Array[ProcedureParameter] =
            params.toArray
          override def isDeterministic: Boolean = false
          override def call(input: InternalRow)
              : java.util.Iterator[Scan] = {
            val findings = body(input).limit(10000).collect()
            val scan: Scan = new LocalScan {
              override def readSchema(): StructType = StructType(
                outCols.map(c =>
                  StructField(c, StringType, nullable = false)))
              override def rows(): Array[InternalRow] =
                findings.map(r => InternalRow(
                  outCols.indices.map(i =>
                    org.apache.spark.unsafe.types.UTF8String
                      .fromString(r.getString(i))): _*))
              override def description(): String =
                s"CommitLogProcedureResult($procName)"
            }
            Collections.singletonList(scan).iterator()
          }
        }
    }

  /** A TYPED result frame through a LocalScan (procFindings is
    * all-String; DESCRIBE DETAIL carries longs/booleans/arrays): the
    * body's DataFrame schema is preserved and rows convert through
    * the standard Catalyst converter. Bounded like procFindings —
    * a diagnostic surface, not a data path. */
  private def procTyped(procName: String,
      params: Seq[ProcedureParameter],
      body: InternalRow => org.apache.spark.sql.DataFrame)
      : UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = procName
      override def description(): String =
        s"commitlog diagnostic procedure $procName"
      override def bind(inputType: StructType): BoundProcedure =
        new BoundProcedure {
          override def name(): String = procName
          override def description(): String =
            s"commitlog diagnostic procedure $procName"
          override def parameters(): Array[ProcedureParameter] =
            params.toArray
          override def isDeterministic: Boolean = false
          override def call(input: InternalRow)
              : java.util.Iterator[Scan] = {
            val df = body(input)
            val schema = df.schema
            val conv = org.apache.spark.sql.catalyst
              .CatalystTypeConverters.createToCatalystConverter(schema)
            // NOT named `rows`: inside the LocalScan the bare name
            // would resolve to the override itself (a scalac-looped
            // self tail call, observed as a 100%-CPU hang)
            val collected = df.limit(10000).collect()
              .map(r => conv(r).asInstanceOf[InternalRow])
            val scan: Scan = new LocalScan {
              override def readSchema(): StructType = schema
              override def rows(): Array[InternalRow] = collected
              override def description(): String =
                s"CommitLogProcedureResult($procName)"
            }
            Collections.singletonList(scan).iterator()
          }
        }
    }

  /** One-row `(version BIGINT)` result through a LocalScan — the
    * procedure's committed version, so `CALL` composes in SQL. */
  private def proc(procName: String, params: Seq[ProcedureParameter],
      body: InternalRow => Long): UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = procName
      override def description(): String =
        s"commitlog lifecycle procedure $procName"
      override def bind(inputType: StructType): BoundProcedure =
        new BoundProcedure {
          override def name(): String = procName
          override def description(): String =
            s"commitlog lifecycle procedure $procName"
          override def parameters(): Array[ProcedureParameter] =
            params.toArray
          override def isDeterministic: Boolean = false
          override def call(input: InternalRow)
              : java.util.Iterator[Scan] = {
            val version = body(input)
            val scan: Scan = new LocalScan {
              override def readSchema(): StructType = StructType(Seq(
                StructField("version", LongType, nullable = false)))
              override def rows(): Array[InternalRow] =
                Array(InternalRow(version))
              override def description(): String =
                s"CommitLogProcedureResult($procName)"
            }
            Collections.singletonList(scan).iterator()
          }
        }
    }
}
