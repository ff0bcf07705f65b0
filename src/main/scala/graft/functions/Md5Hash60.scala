package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Native 60-bit md5 hash: the first 15 hex characters of md5(input) as a
  * BIGINT — bit-identical to the composable form
  * `conv(substr(md5(x), 1, 15), 16, 10)` (and to DuckDB's
  * `('0x' || substr(md5(x), 1, 15))::UBIGINT`), but computed straight from
  * the digest bytes: no 32-char hex string materialization, no base-16
  * string parse, per row. This is the innermost loop of every dedup /
  * fingerprint operator (millions of evaluations per scan), which is what
  * justifies a custom Catalyst `Expression` with `doGenCode` over the
  * built-in composition (SURVEY.md §4.4 escalation rule).
  */
case class Md5Hash60(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {

  override def dataType: DataType = LongType
  override def prettyName: String = "md5hash60"

  // STRING (or anything castable) coerces to BINARY like the built-in
  // hash functions — `md5hash60(text)` works from SQL without an explicit
  // CAST.
  override def inputTypes: Seq[DataType] = Seq(BinaryType)

  override protected def nullSafeEval(input: Any): Any =
    Md5Hash60.hash60(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Hash60.hash60($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Hash60 =
    copy(child = newChild)
}

object Md5Hash60 {

  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** First 60 bits of md5(bytes): big-endian first 8 digest bytes >>> 4
    * ≡ parsing the first 15 hex chars of the hex digest.
    */
  def hash60(bytes: Array[Byte]): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** Column form over a string/binary column. */
  def md5hash60(c: Column): Column =
    Bridge.toColumn(Md5Hash60(Bridge.toExpression(c.cast("binary"))))
}
