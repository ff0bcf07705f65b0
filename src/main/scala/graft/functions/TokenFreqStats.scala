package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-row frequency summary of a string array in ONE hash pass —
  * STRUCT(n, n_distinct, max_count) — the linear replacement for the
  * quadratic lambda composition `text_repetition_ratio` ran per document:
  * `array_max(transform(array_distinct(bg), x -> size(filter(bg, y -> y = x))))`
  * re-scans the whole array once per DISTINCT element (O(B·D) string
  * compares — r13 profile: ~24 s at sf10 for ~500-token docs), where one
  * open-addressing pass is O(B).
  *
  * Exactness: n = array length, n_distinct = |distinct elements|,
  * max_count = the highest NON-NULL element multiplicity — all integers,
  * so the downstream ratios divide the SAME integers the quadratic form
  * divided and every hash-compared value is unchanged (oracle untouched).
  * Null elements count toward n and n_distinct (array_distinct keeps one
  * null) but never toward max_count (the chain's `y = x` predicate is
  * NULL for a null x, so its filter yields 0 there) — the one divergence
  * from the chain is the EMPTY array, where array_max([]) is NULL and
  * this expression returns max_count 0 (the registered caller filters
  * size ≥ 2, so neither case reaches the gate).
  */
case class TokenFreqStats(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("max_count", LongType, nullable = false)))
  override def prettyName: String = "token_freq_stats"

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))

  override protected def nullSafeEval(input: Any): Any =
    TokenFreqStats.process(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenFreqStats.process($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenFreqStats =
    copy(child = newChild)
}

object TokenFreqStats {

  def process(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    val counts = new java.util.HashMap[UTF8String, Int](math.max(16, n * 2))
    var maxCount = 0
    var nulls = 0
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) nulls += 1
      else {
        val k = arr.getUTF8String(i)
        val c = counts.merge(k, 1, (a, b) => a + b)
        if (c > maxCount) maxCount = c
      }
      i += 1
    }
    // nulls count toward n and n_distinct but NEVER toward max_count —
    // the pinned chain's `filter(bg, y -> y = x)` yields 0 for a null x
    // (NULL predicate drops every row), so its array_max sees 0 there
    val distinct = counts.size + (if (nulls > 0) 1 else 0)
    new GenericInternalRow(Array[Any](n.toLong, distinct.toLong, maxCount.toLong))
  }

  /** Column form: STRUCT(n, n_distinct, max_count) of a string array. */
  def tokenFreqStats(c: Column): Column =
    Bridge.toColumn(TokenFreqStats(Bridge.toExpression(c)))
}
