package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Rabin-style polynomial rolling hash of a byte payload:
  * `h = Σ byte_i · B^(n−1−i) mod (2^61 − 1)`, evaluated iteratively as
  * `h ← h·B + byte`. The Mersenne modulus makes the 128-bit product
  * reduction branch-free (`2^61 ≡ 1`, `2^64 ≡ 8`), via
  * `Math.multiplyHigh`.
  *
  * This is the document-fingerprinting primitive whose windowed form
  * drives content-defined chunking: the same recurrence over a sliding
  * window (subtract `byte_out · B^(w−1)`, multiply, add `byte_in`) reuses
  * [[RollingHash61.mulmod]] unchanged.
  */
case class RollingHash61(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash61"

  // STRING coerces to BINARY (UTF-8 bytes) like the built-in hashes.
  override def inputTypes: Seq[DataType] = Seq(BinaryType)

  override protected def nullSafeEval(input: Any): Any =
    RollingHash61.hash(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHash61.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingHash61 =
    copy(child = newChild)
}

object RollingHash61 {

  val Mod: Long = (1L << 61) - 1 // Mersenne prime 2^61 − 1
  val Base: Long = 1000003L

  /** Base⁻¹ mod Mod (Fermat: Base^(Mod−2); Mod is prime). Lets a replay
    * reconstruct every 16-char window hash from ONE per-char prefix term
    * c_j·BaseInv^j in linear time instead of re-folding each window —
    * the dedup_cdc_chunks oracle rewrite. The test suite asserts
    * mulmod(Base, BaseInv) == 1.
    */
  val BaseInv: Long = 1229363429801019168L

  /** (a·b) mod (2^61−1) for 0 ≤ a, b < 2^61, branch-free via the Mersenne
    * identities 2^61 ≡ 1 and 2^64 ≡ 8.
    */
  def mulmod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    // a·b = hi·2^64 + lo ≡ hi·8 + (lo >>> 61) + (lo & Mod)
    var r = hi * 8 + (lo >>> 61) + (lo & Mod)
    while (r >= Mod) r -= Mod
    r
  }

  def hash(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = mulmod(h, Base) + (bytes(i) & 0xffL)
      if (h >= Mod) h -= Mod
      i += 1
    }
    h
  }

  /** Column form over a string/binary column. */
  def rollingHash61(c: Column): Column =
    Bridge.toColumn(RollingHash61(Bridge.toExpression(c.cast("binary"))))
}
