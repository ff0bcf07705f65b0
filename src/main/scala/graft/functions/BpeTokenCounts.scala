package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass pre-tokenization counts — STRUCT(n_bpe_tokens, n_ws_tokens)
  * — the linear replacement for `text_token_bpe`'s
  * `size(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]', 0))`,
  * which materialized an array of EVERY match (one UTF8String allocation
  * per token, ~10⁸ at the 100× SF) only to take its length.
  *
  * Exactness vs the regex (and the DuckDB twin, RE2 over UTF-8):
  * alternation order + greediness make the match set a partition of the
  * non-space text — a maximal `[A-Za-z]+` run is one token, a maximal
  * `[0-9]+` run is one token, and every OTHER code point (symbols,
  * controls, all non-ASCII) is one single-code-point token; spaces match
  * nothing. The byte scan reproduces that partition directly: ASCII
  * letter/digit runs collapse at their first byte, 0x20 is skipped, and
  * any other code point counts once AT ITS LEAD BYTE (continuation bytes
  * `10xxxxxx` are skipped), so multi-byte code points count exactly once
  * — the same code-point granularity both regex engines use.
  * n_ws_tokens = `size(split(text, ' '))` = single-space separators + 1
  * (both engines keep empty segments, so consecutive/leading/trailing
  * spaces contribute their empties through the separator count).
  */
case class BpeTokenCounts(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {

  override def dataType: DataType = StructType(Seq(
    StructField("n_bpe_tokens", LongType, nullable = false),
    StructField("n_ws_tokens", LongType, nullable = false)))
  override def prettyName: String = "bpe_token_counts"

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override protected def nullSafeEval(input: Any): Any =
    BpeTokenCounts.process(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeTokenCounts.process($c)")

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCounts =
    copy(child = newChild)
}

object BpeTokenCounts {

  private def isLetter(b: Byte): Boolean =
    (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')
  private def isDigit(b: Byte): Boolean = b >= '0' && b <= '9'

  def process(s: UTF8String): InternalRow = {
    val n = s.numBytes()
    var bpe = 0L
    var seps = 0L
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      if (isLetter(b)) {
        bpe += 1; i += 1
        while (i < n && isLetter(s.getByte(i))) i += 1
      } else if (isDigit(b)) {
        bpe += 1; i += 1
        while (i < n && isDigit(s.getByte(i))) i += 1
      } else if (b == ' ') {
        seps += 1; i += 1
      } else {
        // symbols, controls, and non-ASCII: one token per CODE POINT —
        // count at the lead byte, skip continuations (10xxxxxx)
        if ((b & 0xC0) != 0x80) bpe += 1
        i += 1
      }
    }
    new GenericInternalRow(Array[Any](bpe, seps + 1L))
  }

  /** Column form: STRUCT(n_bpe_tokens, n_ws_tokens) of a string. */
  def bpeTokenCounts(c: Column): Column =
    Bridge.toColumn(BpeTokenCounts(Bridge.toExpression(c)))
}
