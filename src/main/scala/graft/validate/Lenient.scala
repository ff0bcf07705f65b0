package graft.validate

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Lenient (coerce-to-null) typed interpretation of string columns.
  *
  * Spark 4 runs ANSI mode by default, where a plain `cast` on unparseable
  * input throws; `try_cast`/`try_to_timestamp` reproduce the reference's
  * pandas `errors='coerce'` semantics (reference: validate.py:185-186, :351;
  * breakdown.py:86; SURVEY.md T2).
  */
object Lenient {

  /** Exact-name column reference (handles dots/spaces in column names). */
  def qcol(name: String): Column = col("`" + name.replace("`", "``") + "`")

  /** pandas `to_numeric(errors='coerce')`: unparseable → null. */
  def toDouble(c: Column): Column = c.cast("string").try_cast("double")

  /** pandas `to_datetime(errors='coerce')`: per-element format inference is
    * approximated with a fixed chain of common formats (SURVEY.md T3 — exact
    * pandas parity is impossible without per-element inference; fixtures and
    * common archives use ISO dates, which the first branch covers).
    */
  def toTimestamp(c: Column): Column = {
    val s = c.cast("string")
    coalesce(
      try_to_timestamp(s), // ISO 8601: yyyy-MM-dd[ HH:mm:ss[.S…]]
      try_to_timestamp(s, lit("yyyy/MM/dd")),
      try_to_timestamp(s, lit("MM/dd/yyyy")),
      try_to_timestamp(s, lit("yyyyMMdd")))
  }
}
