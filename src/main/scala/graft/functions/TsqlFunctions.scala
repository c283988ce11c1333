package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar shims reproducing the T-SQL formatting semantics of the
  * reference's embedded query (SURVEY R10-R13; `SELECT.py:76-88`).
  *
  * All thin wrappers over codegen'd built-ins — no UDFs, no custom
  * Expressions — so they stay inside whole-stage codegen and cost
  * nothing at 100 TB (SURVEY §4.3 item 3).
  */
object TsqlFunctions {

  /** T-SQL `CONVERT(VARCHAR, col, style)` for the styles the reference
    * uses (`SELECT.py:76,85-88`): 103 = dd/MM/yyyy, 108 = HH:mm:ss,
    * plus 120 (ODBC canonical) for completeness. */
  def tsqlConvert(c: Column, style: Int): Column = style match {
    case 101 => date_format(c, "MM/dd/yyyy")
    case 102 => date_format(c, "yyyy.MM.dd")
    case 103 => date_format(c, "dd/MM/yyyy")
    case 104 => date_format(c, "dd.MM.yyyy")
    case 105 => date_format(c, "dd-MM-yyyy")
    case 108 => date_format(c, "HH:mm:ss")
    case 110 => date_format(c, "MM-dd-yyyy")
    case 112 => date_format(c, "yyyyMMdd")
    case 120 => date_format(c, "yyyy-MM-dd HH:mm:ss")
    case 121 => date_format(c, "yyyy-MM-dd HH:mm:ss.SSS")
    case other =>
      throw new IllegalArgumentException(s"unsupported CONVERT style $other")
  }

  /** T-SQL `ISNULL(x, default)` (`SELECT.py:80`). Named to avoid
    * clashing with Spark's own single-arg `functions.isnull`. */
  def tsqlIsnull(c: Column, default: Column): Column = coalesce(c, default)

  /** The reference's date+time fusion (`SELECT.py:85-88`):
    * `CONVERT(d,103) + ' ' + CONVERT(t,108)` with T-SQL `+` semantics —
    * NULL-PROPAGATING: either part NULL ⇒ whole result NULL.
    * `concat` matches; `concat_ws` would NOT (SURVEY §7.5). */
  def dtHrString(d: Column, t: Column): Column =
    concat(tsqlConvert(d, 103), lit(" "), tsqlConvert(t, 108))
}
