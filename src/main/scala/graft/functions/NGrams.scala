package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native table-generating function `ngrams(text, n)` → rows of
  * (pos, gram): the 1-based position and the space-joined n-token window
  * over a whitespace-tokenized string. This is the third Catalyst
  * extension kind in the library — scalar ([[Md5Hash60]], [[CosineSim]],
  * [[RollingHash61]], [[CdcBoundaries]]) and aggregate
  * ([[SpaceSavingTopK]]) exist already — and it replaces the
  * `transform(sequence(...), i -> array_join(slice(...)))` + `explode`
  * composition in shingling pipelines with ONE Generate node that never
  * materializes the intermediate gram array per row (the composition
  * allocates an n·tokens array before exploding; the generator streams
  * windows straight into output rows). Generators execute in GenerateExec
  * outside whole-stage codegen either way, so CodegenFallback costs
  * nothing here.
  *
  * Shorter-than-n inputs yield zero rows (same contract as the
  * `len(toks) >= n` guard in the composed form); NULL yields zero rows
  * like the built-in explode of a NULL array.
  */
case class NGrams(child: Expression, n: Int) extends UnaryExpression
    with Generator with CodegenFallback {

  require(n >= 1, s"ngrams window must be >= 1, got $n")

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("gram", StringType, nullable = false)))

  override def prettyName: String = "ngrams"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"ngrams expects a STRING child, got ${child.dataType.catalogString}")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else {
      val toks = v.asInstanceOf[UTF8String].toString.split(" ")
      if (toks.length < n) Nil
      else new Iterator[InternalRow] {
        private var i = 0
        private val last = toks.length - n
        private val sb = new StringBuilder
        override def hasNext: Boolean = i <= last
        override def next(): InternalRow = {
          sb.clear()
          var j = i
          val end = i + n
          while (j < end) {
            if (j > i) sb.append(' ')
            sb.append(toks(j))
            j += 1
          }
          i += 1
          InternalRow(i, UTF8String.fromString(sb.toString))
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): NGrams =
    copy(child = newChild)
}
