package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declarative data-quality audit: each check is a RELATION OF
  * VIOLATIONS (rows that break the rule), the audit result is one row
  * per check with its violation count — the dbt-test / Deequ-shape
  * contract a warehouse pipeline gates loads on.
  *
  * Scale shape: every check stays a declarative plan (anti joins for
  * referential integrity, HAVING for uniqueness, scans for domain
  * rules) so pushdown/broadcast apply per check; the union of
  * single-row counts is driver-trivial. Checks share scan caching via
  * Spark's exchange reuse where plans overlap; nothing is collected.
  * A 100 TB audit runs exactly this plan — the counts are the only
  * materialized output.
  */
object Audit {

  /** One row per (check_name, n_violations), ordered by name. */
  def run(spark: SparkSession,
      checks: Seq[(String, DataFrame)]): DataFrame = {
    require(checks.nonEmpty, "no checks given")
    require(checks.map(_._1).distinct.size == checks.size,
      "duplicate check names")
    checks.map { case (name, violations) =>
      violations.agg(count(lit(1)).as("n_violations"))
        .select(lit(name).as("check_name"), col("n_violations"))
    }.reduce(_.union(_)).orderBy(col("check_name"))
  }

  /** Uniqueness violations: key tuples appearing more than once
    * (one row per offending key, with its multiplicity). */
  def duplicateKeys(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)

  /** Referential-integrity violations: child rows whose FK has no
    * match in the parent PK (LEFT ANTI — one shuffle, or broadcast
    * when the parent is a dim). */
  def orphans(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame =
    child.join(parent.select(col(parentKey).as(childKey)),
      Seq(childKey), "left_anti")
}
