package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — an operator the reference lacks (SURVEY §2.4
  * "join types beyond inner/left equi") but a time-series/feature
  * pipeline needs constantly: for each left row, attach the payload of
  * the latest right row with `right.on <= left.on` in the same key group.
  *
  * Implementation is the scalable union-window trick, NOT the naive
  * range-join + dedup (which multiplies rows before collapsing and
  * explodes at 100 TB):
  *   1. union left and right (right tagged side=0, left side=1);
  *   2. one hash shuffle on the key, one in-partition sort on (on, side);
  *   3. running `last(payload_struct, ignoreNulls)` over rows
  *      UNBOUNDED PRECEDING..CURRENT ROW carries the most recent right
  *      payload forward onto every left row;
  *   4. keep left rows, unpack the struct.
  * Cost: ONE shuffle + ONE sort over |L|+|R| rows — the same shape as a
  * sort-merge join, with no intermediate fan-out. Equal timestamps:
  * right sorts before left (side 0 < 1), so a right row at exactly
  * left.on IS matched — the `<=` convention DuckDB's ASOF JOIN uses.
  *
  * Payload is packed in a struct so genuinely-NULL payload columns on a
  * matched right row are carried as NULL (not skipped over for an older
  * right row by `ignoreNulls`).
  *
  * Determinism: if several right rows share (key, on), which one wins
  * is tie-broken by `rightTiebreak` (descending = "latest wins");
  * without one, the greatest packed payload struct wins — a stable,
  * partitioning-independent pick (never an arbitrary row).
  */
object AsofJoin {

  def backward(
      left: DataFrame,
      right: DataFrame,
      key: Seq[String],
      on: String,
      payload: Seq[String],
      prefix: String = "asof_",
      rightTiebreak: Option[Column] = None): DataFrame = {
    val side = "__graft_side"
    val pack = "__graft_payload"

    // total order within (key, on): explicit tiebreak first, then the
    // payload struct itself so equal-payload rows (interchangeable)
    // are the only remaining ties
    val stable =
      if (payload.isEmpty) lit(1).asc
      else struct(payload.map(col): _*).desc
    val r = Dedup.latestPerKey(
      right.select((key :+ on).map(col) ++ payload.map(col): _*),
      partition = (key :+ on).map(col),
      order = rightTiebreak.map(_.desc).toSeq :+ stable)
      .withColumn(side, lit(0))
      .withColumn(pack, struct(payload.map(col): _*))
      .drop(payload: _*)

    val l = left.withColumn(side, lit(1))

    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window
      .partitionBy(key.map(col): _*)
      .orderBy(col(on).asc, col(side).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = u.withColumn(pack, last(col(pack), ignoreNulls = true).over(w))
      .filter(col(side) === 1)

    payload.foldLeft(matched) { (df, p) =>
      df.withColumn(prefix + p, col(pack).getField(p))
    }.drop(side, pack)
  }
}
