package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-Changing-Dimension Type 2 maintenance — the classic
  * warehouse-dimension operator an ETL engine must ship (Kimball's
  * SCD2: keep every historical attribute value as its own row with a
  * validity interval instead of overwriting in place).
  *
  * Two entry points:
  *   - [[fromHistory]]: build the full versioned dimension from an
  *     observation log (key, event-time, attributes) in one pass.
  *   - [[applyBatch]]: merge a new batch of observations into an
  *     already-built SCD2 table — the incremental path a daily load
  *     runs. LawsSpec pins the equivalence law
  *     `applyBatch(fromHistory(h1), h2) == fromHistory(h1 ∪ h2)`
  *     (batch boundaries must never change the result).
  *
  * Scale shape: everything is ONE hash shuffle on the dimension key
  * followed by per-key window functions — no self-join of history
  * against itself, no driver-side state. At 100 TB the history table
  * partitions by key and each key's timeline folds independently;
  * AQE handles skewed keys. Change detection uses a null-safe
  * comparison (`<=>`) so NULL→value and value→NULL transitions open
  * new versions.
  *
  * Reference scope: the reference tool truncate-and-reloads its
  * dimensions every run (full overwrite, `Select de Importação de
  * Dados.py:213-230`); SCD2 is the standard upgrade of that contract
  * when history must be preserved, listed in SURVEY §2.4 as a gap
  * capability.
  */
object Scd2 {

  /** Build a versioned dimension from an observation history.
    *
    * @param obs      observation log
    * @param key      dimension key column name
    * @param ord      total event-time ordering WITHIN a key — pass
    *                 extra tiebreak columns (e.g. an event id) so the
    *                 ordering is deterministic
    * @param attrs    tracked attribute column names; a row opens a new
    *                 version iff any tracked attribute differs
    *                 (null-safely) from the previous observation
    * @return (key, version, attrs..., valid_from, valid_to,
    *         is_current) — `valid_from`/`valid_to` are the `ord.head`
    *         values of the opening/closing observation, `valid_to`
    *         NULL on the open (current) version
    */
  def fromHistory(obs: DataFrame, key: String, ord: Seq[Column],
      attrs: Seq[String]): DataFrame = {
    require(attrs.nonEmpty, "at least one tracked attribute")
    val w = Window.partitionBy(col(key)).orderBy(ord: _*)
    // a row is a change point iff any tracked attr differs null-safely
    // from the previous observation of the same key
    val changed = attrs
      .map(a => !(col(a) <=> lag(col(a), 1).over(w)))
      .reduce(_ || _) || row_number().over(w) === 1
    val wv = Window.partitionBy(col(key)).orderBy(ord: _*)
    obs
      .withColumn("__chg", changed)
      .filter(col("__chg"))
      .withColumn("version", row_number().over(wv))
      .withColumn("valid_from", ord.head)
      .withColumn("valid_to", lead(ord.head, 1).over(wv))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col(key) +: col("version") +: attrs.map(col) :+
        col("valid_from") :+ col("valid_to") :+ col("is_current"): _*)
  }

  /** Incremental merge: fold a new observation batch into an existing
    * SCD2 table. Implementation re-derives the affected keys' timelines
    * from (existing versions re-expressed as observations) ∪ (new
    * batch) — only KEYS PRESENT IN THE BATCH are touched; untouched
    * keys pass through unchanged, so the shuffle is sized by the delta,
    * not the dimension. This is the standard "rebuild the changed
    * partition" lakehouse merge shape.
    *
    * Append-only contract: batch observations must be at-or-after the
    * existing versions' opening times for their key (the daily-load
    * regime). Out-of-order arrivals would need the collapsed-away
    * duplicate observations to re-split runs — rebuild via
    * [[fromHistory]] over the full log instead. LawsSpec pins the
    * equivalence under this contract.
    *
    * @param dim      existing SCD2 table as produced by [[fromHistory]]
    *                 (valid_from carries the opening ord-head value)
    * @param batch    new observations, same schema as [[fromHistory]]'s
    *                 `obs` input
    * @param ordNames column names of `ord` in the batch schema; the
    *                 head is the event-time column, the rest tiebreaks
    */
  def applyBatch(dim: DataFrame, batch: DataFrame, key: String,
      ord: Seq[Column], ordNames: Seq[String],
      attrs: Seq[String]): DataFrame = {
    val touched = batch.select(col(key)).distinct()
    // existing versions of touched keys, re-expressed as observations
    // at their opening time; tiebreak columns are reconstructed as NULL
    // (sorts first in Spark ASC — existing versions order before any
    // same-instant batch row, preserving the append-only fold)
    val tiebreakNulls = ordNames.tail.map(n =>
      lit(null).cast(batch.schema(n).dataType).as(n))
    val reObs = dim.join(touched, Seq(key), "left_semi")
      .select(Seq(col(key), col("valid_from").as(ordNames.head)) ++
        tiebreakNulls ++ attrs.map(col): _*)
    val cols = (key +: ordNames) ++ attrs
    val rebuilt = fromHistory(
      reObs.select(cols.map(col): _*)
        .unionByName(batch.select(cols.map(col): _*)),
      key, ord, attrs)
    dim.join(touched, Seq(key), "left_anti").unionByName(rebuilt)
  }
}
