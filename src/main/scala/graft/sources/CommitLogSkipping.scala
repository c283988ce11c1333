package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, IsNotNull, IsNull, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The planning half of wiring [[CommitLogStats]] sidecars into the
  * DSv2 / SQL read path: translate the Catalyst filter conjuncts
  * Spark pushes into a scan into per-column range probes, decide
  * which of a snapshot's segments can possibly hold matching rows,
  * and (independently) answer whole-table COUNT / MIN / MAX
  * aggregates from sidecars alone.
  *
  * Everything here is CONSERVATIVE in exactly the
  * [[CommitLogStats]] sense — a segment is pruned only when its
  * sidecar PROVES no row can match, and the exact predicate is still
  * applied to the survivors by Spark (parquet data filters are always
  * re-evaluated post-scan), so a stats gap, an untranslatable
  * predicate shape, or a tag/type mismatch can never change results;
  * they only cost skipped pruning. Unlike the programmatic
  * [[CommitLogStats.planSkipping]] (which fails LOUDLY on a probe
  * type mismatch, because the caller chose the probe value), a
  * mismatch here keeps the segment: the SQL analyzer already
  * type-checked the comparison, so a tag mismatch means the sidecar
  * was written under an older schema — conservative keep is the only
  * correct answer.
  *
  * 100 TB posture: this is the Delta/Iceberg scan-reduction payoff
  * on the surface a user actually queries — a selective
  * `SELECT … WHERE k BETWEEN a AND b` through `format("commitlog")`
  * or the SQL catalog now opens only the segments whose sidecar
  * bounds intersect the predicate, instead of every live footer; a
  * bare `SELECT count(*) / min(c) / max(c)` opens NO data files at
  * all. Sidecar reads are one tiny `_stats.json` per segment at plan
  * time, the same cost [[CommitLogStats.planSkipping]] already pays.
  */
object CommitLogSkipping {

  /** One decomposed conjunct usable for pruning: a one-sided bound,
    * an IS NULL / IS NOT NULL witness, or nothing (conservative). */
  private sealed trait Probe { def col: String }
  private final case class Lower(col: String, tag: String, v: Any,
      strict: Boolean) extends Probe
  private final case class Upper(col: String, tag: String, v: Any,
      strict: Boolean) extends Probe
  private final case class NullOnly(col: String) extends Probe
  private final case class NonNull(col: String) extends Probe
  /** Equality/IN probe for BLOOM sidecars: the row must equal one of
    * `values` — a segment whose bloom says every value is definitely
    * absent cannot match. Range probes still apply independently. */
  private final case class MightEq(col: String,
      values: Seq[(String, Any)]) extends Probe

  /** Canonical (tag, value) for a literal's INTERNAL representation —
    * the mirror of [[CommitLogStats.encodeProbe]] for Catalyst
    * internal values (UTF8String strings, micros timestamps, day
    * ints). None for null literals and unsupported types. */
  private def encodeLiteral(l: Literal): Option[(String, Any)] = {
    if (l.value == null) return None
    l.dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        Some(("long", l.value.asInstanceOf[Number].longValue()))
      case BooleanType =>
        // mirrors CommitLogStats.encode: false<true ≡ 0<1
        Some(("long", if (l.value.asInstanceOf[Boolean]) 1L else 0L))
      case FloatType | DoubleType =>
        // -0.0 normalized to 0.0 — SQL equality vs Double.compare
        // ordering (same rule as CommitLogStats.encode)
        val d = l.value.asInstanceOf[Number].doubleValue()
        Some(("double", if (d == 0.0) 0.0 else d))
      case StringType => Some(("string", l.value.toString))
      case DateType =>
        Some(("date", l.value.asInstanceOf[Int].toLong))
      case TimestampType | TimestampNTZType =>
        Some(("ts", l.value.asInstanceOf[Long]))
      case _: DecimalType =>
        Some(("decimal",
          l.value.asInstanceOf[Decimal].toJavaBigDecimal))
      case _ => None
    }
  }

  /** Decompose pushed filter conjuncts into probes. Any shape not
    * understood contributes nothing (keep-everything for it). */
  private def toProbes(exprs: Seq[Expression]): Seq[Probe] = {
    def split(e: Expression): Seq[Expression] = e match {
      case And(l, r) => split(l) ++ split(r)
      case other => Seq(other)
    }
    exprs.flatMap(split).flatMap {
      case GreaterThan(a: AttributeReference, l: Literal) =>
        encodeLiteral(l).map { case (t, v) => Lower(a.name, t, v, true) }
      case GreaterThan(l: Literal, a: AttributeReference) =>
        encodeLiteral(l).map { case (t, v) => Upper(a.name, t, v, true) }
      case GreaterThanOrEqual(a: AttributeReference, l: Literal) =>
        encodeLiteral(l).map { case (t, v) => Lower(a.name, t, v, false) }
      case GreaterThanOrEqual(l: Literal, a: AttributeReference) =>
        encodeLiteral(l).map { case (t, v) => Upper(a.name, t, v, false) }
      case LessThan(a: AttributeReference, l: Literal) =>
        encodeLiteral(l).map { case (t, v) => Upper(a.name, t, v, true) }
      case LessThan(l: Literal, a: AttributeReference) =>
        encodeLiteral(l).map { case (t, v) => Lower(a.name, t, v, true) }
      case LessThanOrEqual(a: AttributeReference, l: Literal) =>
        encodeLiteral(l).map { case (t, v) => Upper(a.name, t, v, false) }
      case LessThanOrEqual(l: Literal, a: AttributeReference) =>
        encodeLiteral(l).map { case (t, v) => Lower(a.name, t, v, false) }
      case EqualTo(a: AttributeReference, l: Literal) =>
        encodeLiteral(l).toSeq.flatMap { case (t, v) =>
          Seq(Lower(a.name, t, v, false), Upper(a.name, t, v, false),
            MightEq(a.name, Seq((t, v)))) }
      case EqualTo(l: Literal, a: AttributeReference) =>
        encodeLiteral(l).toSeq.flatMap { case (t, v) =>
          Seq(Lower(a.name, t, v, false), Upper(a.name, t, v, false),
            MightEq(a.name, Seq((t, v)))) }
      case In(a: AttributeReference, vs)
          if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
        // null literals in the list match nothing; bounds over the
        // non-null values are exact for the rows that CAN match
        val enc = vs.map(_.asInstanceOf[Literal]).flatMap(encodeLiteral)
        if (enc.isEmpty || enc.map(_._1).distinct.size != 1) Seq.empty
        else {
          val tag = enc.head._1
          val lo = enc.map(_._2).reduce((x, y) =>
            if (CommitLogStats.cmp(tag, x, y) <= 0) x else y)
          val hi = enc.map(_._2).reduce((x, y) =>
            if (CommitLogStats.cmp(tag, x, y) >= 0) x else y)
          Seq(Lower(a.name, tag, lo, false),
            Upper(a.name, tag, hi, false),
            MightEq(a.name, enc.toSeq))
        }
      case IsNull(a: AttributeReference) => Seq(NullOnly(a.name))
      case IsNotNull(a: AttributeReference) => Seq(NonNull(a.name))
      case _ => Seq.empty
    }
  }

  /** Which of `segments` can hold a row satisfying ALL `exprs`
    * conjuncts. Sidecar-less or column-less segments are always
    * kept; all-NULL columns fail range and IS NOT NULL probes. */
  def keptSegments(spark: SparkSession, segments: Seq[String],
      exprs: Seq[Expression],
      keys: Map[String, CommitLogStats.ProbeKeys] = Map.empty)
      : Seq[String] = {
    val probes = toProbes(exprs)
    if (probes.isEmpty) return segments
    // `keys`: era-correct sidecar lookup sets per probe column
    // ([[CommitLogStats.skippingKeys]] — physical name for marker
    // sidecars, hazard-filtered write-time aliases for legacy ones);
    // a rename never changes values, so bounds under a trusted key
    // describe the same data
    def keysOf(c: String): CommitLogStats.ProbeKeys =
      keys.getOrElse(c, CommitLogStats.ProbeKeys(None, Seq(c)))
    val (eqProbes, statProbes) = probes.partition(_.isInstanceOf[MightEq])
    segments.filter { seg =>
      val sidecar = CommitLogStats.readSidecar(spark, seg)
      val statsOk = sidecar match {
        case None => true
        case Some(stats) => statProbes.forall { p =>
          CommitLogStats.lookupStats(stats, keysOf(p.col)) match {
            case None => true
            case Some(cs) => p match {
              case Lower(_, tag, v, strict) =>
                if (cs.tag != tag) true
                else cs.max.exists(mx => {
                  val c = CommitLogStats.cmp(tag, mx, v)
                  if (strict) c > 0 else c >= 0
                })
              case Upper(_, tag, v, strict) =>
                if (cs.tag != tag) true
                else cs.min.exists(mn => {
                  val c = CommitLogStats.cmp(tag, mn, v)
                  if (strict) c < 0 else c <= 0
                })
              case NullOnly(_) => cs.nulls > 0
              case NonNull(_) => cs.min.isDefined
              case _: MightEq => true // partitioned out above
            }
          }
        }
      }
      // bloom sidecars, consulted ONLY for surviving segments (cheap
      // stats first, sketch I/O second); absent bloom → conservative
      statsOk && eqProbes.forall {
        case MightEq(c, values) =>
          CommitLogStats.bloomNames(keysOf(c),
              sidecar.exists(_.physicalKeys))
            .flatMap(a => CommitLogStats.readBloom(spark, seg, a))
              .headOption match {
            case None => true
            case Some(bf) => values.exists {
              case ("long", v) =>
                bf.mightContainLong(v.asInstanceOf[Long])
              case ("string", v) =>
                bf.mightContainString(v.asInstanceOf[String])
              case _ => true // bloom never built for other types
            }
          }
        case _ => true
      }
    }
  }

  private def columnOf(
      e: org.apache.spark.sql.connector.expressions.Expression)
      : Option[String] = e match {
    case nr: NamedReference if nr.fieldNames().length == 1 =>
      Some(nr.fieldNames()(0))
    case _ => None
  }

  /** Answer a pushed whole-table aggregation from sidecars alone:
    * COUNT(*) / COUNT(col) / MIN(col) / MAX(col), no grouping, no
    * filters. Returns the exact output schema Spark expects for a
    * COMPLETE pushdown plus the single result row, or None when any
    * needed sidecar/column is missing (the caller falls back to
    * parquet footer pushdown — a partial metadata answer would be
    * silently wrong). Sidecar MIN/MAX are exact (computed from the
    * landed rows), so — unlike footer pushdown, which refuses
    * string / timestamp / decimal min-max because parquet binary
    * stats may be truncated — every sidecar stats type is served. */
  def metadataAggregate(spark: SparkSession, segments: Seq[String],
      schema: StructType, agg: Aggregation)
      : Option[(StructType, InternalRow)] = {
    if (agg.groupByExpressions().nonEmpty) return None
    val sides = segments.map(CommitLogStats.readSidecar(spark, _))
    if (sides.exists(_.isEmpty)) return None
    val stats = sides.flatten
    val totalRows = stats.map(_.rows).sum

    def colStats(c: String): Option[Seq[CommitLogStats.ColStats]] = {
      val per = stats.map(_.cols.get(c))
      if (per.exists(_.isEmpty)) None
      else {
        val cs = per.flatten
        if (cs.map(_.tag).distinct.size > 1) None else Some(cs)
      }
    }

    /** Sidecar canonical value → Catalyst internal value for `dt`. */
    def internal(dt: DataType, v: Any): Any = dt match {
      case ByteType => v.asInstanceOf[Long].toByte
      case ShortType => v.asInstanceOf[Long].toShort
      case IntegerType => v.asInstanceOf[Long].toInt
      case LongType => v.asInstanceOf[Long]
      case FloatType => v.asInstanceOf[Double].toFloat
      case DoubleType => v.asInstanceOf[Double]
      case StringType => UTF8String.fromString(v.asInstanceOf[String])
      case DateType => v.asInstanceOf[Long].toInt
      case TimestampType | TimestampNTZType => v.asInstanceOf[Long]
      case d: DecimalType => Decimal(scala.math.BigDecimal(
        v.asInstanceOf[java.math.BigDecimal]), d.precision, d.scale)
      case other => throw new IllegalStateException(
        s"commitlog metadata aggregate: unexpected type $other")
    }

    val fields = Vector.newBuilder[StructField]
    val values = Vector.newBuilder[Any]
    agg.aggregateExpressions().foreach {
      case _: CountStar =>
        fields += StructField("count(*)", LongType, nullable = false)
        values += totalRows
      case c: Count if !c.isDistinct =>
        val name = columnOf(c.column).getOrElse(return None)
        val cs = colStats(name).getOrElse(return None)
        fields += StructField(s"count($name)", LongType, nullable = false)
        values += (totalRows - cs.map(_.nulls).sum)
      case m: Max =>
        val name = columnOf(m.column).getOrElse(return None)
        if (!schema.fieldNames.contains(name)) return None
        val dt = schema(name).dataType
        val cs = colStats(name).getOrElse(return None)
        val tag = cs.headOption.map(_.tag).getOrElse("long")
        val mx = cs.flatMap(_.max).reduceOption((a, b) =>
          if (CommitLogStats.cmp(tag, a, b) >= 0) a else b)
        fields += StructField(s"max($name)", dt, nullable = true)
        values += mx.map(internal(dt, _)).orNull
      case m: Min =>
        val name = columnOf(m.column).getOrElse(return None)
        if (!schema.fieldNames.contains(name)) return None
        val dt = schema(name).dataType
        val cs = colStats(name).getOrElse(return None)
        val tag = cs.headOption.map(_.tag).getOrElse("long")
        val mn = cs.flatMap(_.min).reduceOption((a, b) =>
          if (CommitLogStats.cmp(tag, a, b) <= 0) a else b)
        fields += StructField(s"min($name)", dt, nullable = true)
        values += mn.map(internal(dt, _)).orNull
      case _ => return None
    }
    Some((StructType(fields.result()),
      InternalRow.fromSeq(values.result())))
  }
}
