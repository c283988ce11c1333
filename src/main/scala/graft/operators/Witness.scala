package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cheap equality witnesses for protocol laws that queries carry as
  * boolean columns (replica ≡ source, feed-applied ≡ from-scratch).
  */
object Witness {

  /** True iff `a` and `b` are equal as MULTISETS (same rows with the
    * same duplicities — `exceptAll` both ways empty). One tagged
    * union + one hash aggregate + an any-mismatch probe: a single
    * shuffle and a single job, where the two-`exceptAll` phrasing
    * this replaces planned two co-group shuffles of both inputs and
    * ran two jobs (guide §2.4: one exchange can serve two operations
    * keyed the same way). NULL group keys compare equal, exactly as
    * `exceptAll` treats them. Columns are matched by `a`'s names. */
  def multisetEqual(a: DataFrame, b: DataFrame): Boolean = {
    val cols = a.columns.toSeq
    a.withColumn("__side", lit(1L))
      .unionByName(b.select(cols.map(col): _*)
        .withColumn("__side", lit(-1L)))
      .groupBy(cols.map(col): _*)
      .agg(sum(col("__side")).as("__d"))
      .filter(col("__d") =!= 0L)
      .limit(1).collect().isEmpty
  }
}
