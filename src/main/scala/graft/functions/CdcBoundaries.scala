package graft.functions

import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable.ArrayBuilder

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType}

/** Content-defined chunking cut points: the 1-based end positions `i`
  * (window ≤ i ≤ n) where the Rabin hash of the trailing `window` bytes
  * satisfies `hash & mask == 0` — the boundary rule of CDC dedup
  * (LBFS/FastCDC family): boundaries depend only on local content, so an
  * insertion early in a document shifts, but does not rewrite, the
  * chunking of everything after it.
  *
  * This is the windowed form of [[RollingHash61]] (same base, same
  * Mersenne modulus): each step retires the outgoing byte
  * (`h ← h − byte_out·B^(w−1)`), advances (`h ← h·B + byte_in`), and
  * tests the mask — O(n) per document regardless of window size, vs the
  * O(n·w) of hashing every window independently (which is exactly what
  * the DuckDB oracle does, making the two independently-derived).
  */
case class CdcBoundaries(child: Expression, window: Int, mask: Long)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(window > 0, s"window must be positive: $window")
  require(mask >= 0, s"mask must be non-negative: $mask")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "cdc_boundaries"
  override def inputTypes: Seq[DataType] = Seq(BinaryType)

  override protected def nullSafeEval(input: Any): Any =
    CdcBoundaries.boundaries(input.asInstanceOf[Array[Byte]], window, mask)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CdcBoundaries.boundaries($c, $window, ${mask}L)")

  override protected def withNewChildInternal(newChild: Expression): CdcBoundaries =
    copy(child = newChild)
}

object CdcBoundaries {

  import RollingHash61.{Base, Mod, mulmod}

  /** B^(w−1) mod M, cached per window size. */
  private val powCache = new ConcurrentHashMap[Int, java.lang.Long]()
  private def basePow(w: Int): Long =
    powCache.computeIfAbsent(w, { w =>
      var p = 1L
      var i = 1
      while (i < w) { p = mulmod(p, Base); i += 1 }
      p
    }).longValue()

  def boundaries(bytes: Array[Byte], w: Int, mask: Long): ArrayData = {
    val n = bytes.length
    val out = ArrayBuilder.make[Int]
    if (n >= w) {
      val bw1 = basePow(w)
      var h = 0L
      var i = 0
      while (i < w) {
        h = mulmod(h, Base) + (bytes(i) & 0xffL)
        if (h >= Mod) h -= Mod
        i += 1
      }
      if ((h & mask) == 0L) out += w
      while (i < n) {
        h += Mod - mulmod(bytes(i - w) & 0xffL, bw1) // retire outgoing byte
        if (h >= Mod) h -= Mod
        h = mulmod(h, Base) + (bytes(i) & 0xffL)     // admit incoming byte
        if (h >= Mod) h -= Mod
        i += 1
        if ((h & mask) == 0L) out += i
      }
    }
    new GenericArrayData(out.result())
  }

  /** Column form over a string/binary column. */
  def cdcBoundaries(c: Column, window: Int, mask: Long): Column =
    Bridge.toColumn(CdcBoundaries(Bridge.toExpression(c.cast("binary")), window, mask))

  /** CDC cut points are BYTE offsets; the registered queries apply them
    * with character-indexed `substring`, which is only valid while the
    * text is pure ASCII (1 byte = 1 char). This guard makes the
    * precondition loud: any multi-byte character fails the query with a
    * clear error instead of silently misaligning chunks (and silently
    * diverging from the char-indexed oracle).
    */
  def asciiOnly(text: Column, ctx: Column, what: String = "CDC"): Column = {
    import org.apache.spark.sql.functions.{concat, length, lit, octet_length, raise_error, when}
    // NULL text must null-propagate (as cdcBoundaries itself does), not
    // trip the guard: length(NULL) === octet_length(NULL) is NULL, which
    // `when` would otherwise route to the raise_error branch.
    when(text.isNull || length(text) === octet_length(text), text)
      .otherwise(raise_error(concat(
        lit(s"$what requires ASCII text (byte == char offsets); multi-byte text at "),
        ctx.cast("string"))))
  }
}
