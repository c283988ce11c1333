package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.StructType

/** Load-time schema validation (SURVEY O10).
  *
  * The reference only checks column COUNT of the first fetched batch
  * against the declared sink columns (`SELECT.py:205-210`); this is the
  * stronger engine-level contract — names, order and types — applied to
  * the whole plan before any data moves (analysis-time, zero scan cost).
  */
object SchemaAssert {

  final case class SchemaMismatch(message: String)
      extends IllegalArgumentException(message)

  /** Names+order+types must match exactly; nullability is advisory in
    * parquet land and intentionally ignored. */
  def require(df: DataFrame, expected: StructType): DataFrame = {
    val got = df.schema
    if (got.length != expected.length)
      throw SchemaMismatch(
        s"column count ${got.length} != expected ${expected.length}: " +
          s"got ${got.fieldNames.mkString(",")}")
    got.fields.zip(expected.fields).foreach { case (g, e) =>
      if (g.name != e.name)
        throw SchemaMismatch(s"column name '${g.name}' != expected '${e.name}'")
      if (g.dataType != e.dataType)
        throw SchemaMismatch(
          s"column '${g.name}' type ${g.dataType.simpleString} != " +
            s"expected ${e.dataType.simpleString}")
    }
    df
  }

  /** The reference's weaker arity-only check, kept for parity. */
  def requireArity(df: DataFrame, nColumns: Int): DataFrame = {
    if (df.schema.length != nColumns)
      throw SchemaMismatch(
        s"column count ${df.schema.length} != expected $nColumns")
    df
  }
}
