package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused single-pass text normalization — the native replacement for the
  * 4-pass builtin chain
  * `trim(regexp_replace(regexp_replace(lower(text), '[0-9]+', '0'), '\s+', ' '))`
  * plus `size(regexp_extract_all(text, '[0-9]+'))` that `text_normalize_scrub`
  * ran per document (r13 profile: 24.6 s at sf10, the heaviest entry of
  * the text scalar-scan tier). Each regexp_replace walks the string with
  * a Matcher and materializes an intermediate copy; this expression
  * produces the identical result in ONE scan with one output buffer.
  *
  * Semantics are pinned to the builtins it replaces, not re-invented:
  *  - lowercase is delegated to `UTF8String.toLowerCase` — the exact
  *    implementation behind Spark's `lower()`;
  *  - digit runs are maximal `[0-9]+` runs (ASCII, as in Java regex),
  *    each replaced by a single '0' and counted (the count equals
  *    `size(regexp_extract_all(text, '[0-9]+'))` — lowercasing never
  *    creates or destroys ASCII digits);
  *  - whitespace is Java regex `\s` = [ \t\n\\x0B\f\r] (ASCII — NOT
  *    Character.isWhitespace, which would also match unicode spaces and
  *    silently diverge from the regex chain the oracle replays);
  *  - the final trim strips only the single leading/trailing ' ' the
  *    whitespace collapse can leave, which is exactly what `trim` (space
  *    trim) did after `\s+ -> ' '`.
  *
  * Returns STRUCT(n_digit_runs BIGINT, norm STRING). PropertySpec pins
  * equality against the builtin chain on adversarial inputs, and the
  * registered query's unchanged DuckDB oracle re-proves it at every SF.
  */
case class NormalizeScrub(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {

  override def dataType: DataType = StructType(Seq(
    StructField("n_digit_runs", LongType, nullable = false),
    StructField("norm", StringType, nullable = false)))
  override def prettyName: String = "normalize_scrub"

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override protected def nullSafeEval(input: Any): Any =
    NormalizeScrub.process(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeScrub.process($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeScrub =
    copy(child = newChild)
}

object NormalizeScrub {

  private def isWs(c: Char): Boolean = // Java regex \s, exactly
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** One scan over the LOWERED text: collapse digit runs to '0' (counting
    * them), collapse `\s+` runs to ' ', then strip the at-most-one space
    * the collapse leaves at each end.
    */
  def process(input: UTF8String): InternalRow = {
    val s = input.toLowerCase.toString
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var runs = 0L
    var inDigit = false
    var inWs = false
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c >= '0' && c <= '9') {
        if (!inDigit) { runs += 1; sb.append('0') }
        inDigit = true; inWs = false
      } else if (isWs(c)) {
        if (!inWs) sb.append(' ')
        inWs = true; inDigit = false
      } else {
        sb.append(c)
        inDigit = false; inWs = false
      }
      i += 1
    }
    var from = 0
    var to = sb.length
    if (to > from && sb.charAt(from) == ' ') from += 1
    if (to > from && sb.charAt(to - 1) == ' ') to -= 1
    new GenericInternalRow(Array[Any](runs,
      UTF8String.fromString(sb.substring(from, to))))
  }

  /** Column form: STRUCT(n_digit_runs, norm) of a string column. */
  def normalizeScrub(c: Column): Column =
    Bridge.toColumn(NormalizeScrub(Bridge.toExpression(c)))
}
