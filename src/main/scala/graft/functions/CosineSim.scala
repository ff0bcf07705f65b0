package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd cosine similarity of two float-vector columns: dot product and
  * both norms accumulate in ONE double-precision pass over the arrays.
  *
  * The composable form (`aggregate(zip_with(...))` + separate norm
  * aggregates) runs in Catalyst's interpreted higher-order-function path and
  * materializes a lambda array per pair — at 4M candidate pairs it was the
  * entire runtime of the embedding near-dup query (313 s at sf0.1). This is
  * the custom-`Expression` escalation the architecture reserves for
  * semantics the built-ins express only slowly.
  *
  * Matches DuckDB's `list_cosine_similarity(a::DOUBLE[], b::DOUBLE[])`
  * bit-for-bit on float inputs: same left-to-right accumulation, same
  * `dot / sqrt(na·nb)` final form.
  */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  private def isVec(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }
  private def isFloatArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isVec(left.dataType) && isVec(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT>/ARRAY<DOUBLE> inputs, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")

  // Element accessors are resolved once from the static input types
  // (constants in the generated code), so the hot loop has no per-element
  // type branch after JIT.
  private lazy val leftIsFloat = isFloatArray(left.dataType)
  private lazy val rightIsFloat = isFloatArray(right.dataType)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      leftIsFloat, rightIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.CosineSim.cosine($a, $b, $leftIsFloat, $rightIsFloat)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {

  /** One-pass cosine over float/double ArrayData, accumulating in double. */
  def cosine(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / math.sqrt(na * nb)
  }

  /** Column form over two array<float> columns. */
  def cosineSim(a: Column, b: Column): Column =
    Bridge.toColumn(CosineSim(Bridge.toExpression(a), Bridge.toExpression(b)))
}
