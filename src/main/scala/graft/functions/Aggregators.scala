package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` (UDAF) surface — SURVEY §2.4 "UDF/UDAF/UDTF".
  * The reference defines zero user functions; these are the engine's
  * canonical examples of custom aggregation where the built-ins don't
  * reach, registered per-use via `.toColumn` or `udaf(...)`.
  */
object Aggregators {

  /** Elementwise minimum of fixed-width long arrays — the algebraic
    * form of MinHash signature aggregation (merge-able ⇒ map-side
    * partial aggregation works; the shuffle carries one array per
    * group, not one row per shingle). */
  class ArrayMin(width: Int)
      extends Aggregator[Array[Long], Array[Long], Array[Long]] {
    override def zero: Array[Long] = Array.fill(width)(Long.MaxValue)
    override def reduce(b: Array[Long], a: Array[Long]): Array[Long] = {
      var i = 0
      val n = math.min(b.length, a.length)
      while (i < n) { if (a(i) < b(i)) b(i) = a(i); i += 1 }
      b
    }
    override def merge(x: Array[Long], y: Array[Long]): Array[Long] =
      reduce(x, y)
    override def finish(r: Array[Long]): Array[Long] = r
    override def bufferEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
  }

  /** Exact sum of doubles via java BigDecimal accumulation —
    * order-independent (unlike naive double sums under shuffle), the
    * typed twin of the engine's cast-through-decimal SQL discipline. */
  object DecimalSum extends Aggregator[Double, java.math.BigDecimal, Double] {
    override def zero: java.math.BigDecimal = java.math.BigDecimal.ZERO
    override def reduce(b: java.math.BigDecimal, a: Double) =
      b.add(new java.math.BigDecimal(a))
    override def merge(x: java.math.BigDecimal, y: java.math.BigDecimal) =
      x.add(y)
    override def finish(r: java.math.BigDecimal): Double = r.doubleValue
    override def bufferEncoder: Encoder[java.math.BigDecimal] =
      Encoders.kryo[java.math.BigDecimal]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
