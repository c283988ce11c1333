package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded top-k per group as a mergeable Aggregator — the scale path
  * for "top k rows per key".
  *
  * The window form (`ROW_NUMBER() OVER (PARTITION BY key ORDER BY v)
  * <= k`, the engine's q04/q09 pattern) must shuffle EVERY input row
  * to its key's partition and sort there; Spark's WindowGroupLimit
  * push-down trims some of that but the exchange still carries
  * whatever survives per-partition limits. An algebraic top-k
  * aggregation instead rides hash-aggregate partial merge: each map
  * task keeps at most k rows PER KEY in its partial state, so the
  * exchange moves ≤ groups × k tuples regardless of fan-in — at
  * 100 TB with billions of rows over millions of keys that is the
  * difference between shuffling the fact table and shuffling the
  * answer. The tradeoff is per-group state of size k, so k is
  * required small (≤ 1024 here); for large k use the window form.
  *
  * Determinism: total order on (value DESC, tiebreak ASC); ties
  * beyond the tiebreak cannot occur because the tiebreak is required
  * unique per group by the caller (spec-pinned law: equals the
  * window-form twin row-for-row).
  */
object TopK {

  type Entry = (Double, Long)

  /** Merge-able bounded top-k of (value, tiebreak) pairs, best first:
    * larger value wins, equal values broken by smaller tiebreak. */
  final class TopKPairs(k: Int)
      extends Aggregator[Entry, List[Entry], Seq[Entry]] {
    require(k >= 1 && k <= 1024, s"TopK: k out of (0, 1024]: $k")

    private def better(a: Entry, b: Entry): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

    override def zero: List[Entry] = Nil

    /** Insert into a ≤k sorted (best-first) list — O(k) per row. */
    override def reduce(buf: List[Entry], a: Entry): List[Entry] = {
      if (buf.lengthCompare(k) >= 0 && !better(a, buf.last)) buf
      else {
        val (front, back) = buf.span(better(_, a))
        (front ::: a :: back).take(k)
      }
    }

    override def merge(x: List[Entry], y: List[Entry]): List[Entry] = {
      // merge of two sorted lists, truncated at k
      val out = List.newBuilder[Entry]
      var (xs, ys, n) = (x, y, 0)
      while (n < k && (xs.nonEmpty || ys.nonEmpty)) {
        if (ys.isEmpty || (xs.nonEmpty && better(xs.head, ys.head))) {
          out += xs.head; xs = xs.tail
        } else { out += ys.head; ys = ys.tail }
        n += 1
      }
      out.result()
    }

    override def finish(r: List[Entry]): Seq[Entry] = r
    override def bufferEncoder: Encoder[List[Entry]] =
      ExpressionEncoder[List[Entry]]()
    override def outputEncoder: Encoder[Seq[Entry]] =
      ExpressionEncoder[Seq[Entry]]()
  }

  /** Top-k rows per key: one hash aggregation (map-side partial
    * top-k), then a map-side posexplode back to rows. Output columns:
    * the key columns, `rank` (1-based), `valueCol`, `tieCol`. */
  def topkPerKey(df: DataFrame, keyCols: Seq[String], valueCol: String,
      tieCol: String, k: Int): DataFrame = {
    val agg = udaf(new TopKPairs(k), ExpressionEncoder[Entry]())
    val keys: Seq[Column] = keyCols.map(col)
    df.groupBy(keys: _*)
      .agg(agg(col(valueCol).cast("double"), col(tieCol).cast("long"))
        .as("top"))
      .select(keys :+ posexplode(col("top")).as(Seq("pos", "e")): _*)
      .select(keys ++ Seq((col("pos") + 1).as("rank"),
        col("e._1").as(valueCol), col("e._2").as(tieCol)): _*)
  }
}
