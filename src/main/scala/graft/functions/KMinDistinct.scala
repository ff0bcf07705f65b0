package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** The k smallest DISTINCT values of a BIGINT column as a bounded
  * `TypedImperativeAggregate` — the KMV (k-minimum-values) sketch
  * primitive (Beyer et al., SIGMOD'07; the set-algebra form already runs
  * as `q_kmv_setops`).
  *
  * Fed a uniform deterministic hash (the repo's h60), the k-th smallest
  * distinct hash h_k yields the classic distinct-count estimate
  * (k−1)·2⁶⁰/h_k with rsd ≈ 1/√(k−2) — WITHOUT the distinct shuffle an
  * exact count pays: state is ≤ k longs per partial, update is one
  * TreeSet probe, merge is a bounded set union, and only k values per
  * (partition, group) ever cross the wire. That single-pass shape is the
  * 100 TB deployment profile (`dq_column_profile_approx_deploy`), and —
  * unlike HyperLogLog registers, whose estimate no second engine can
  * replay — every emitted value is a deterministic function of the input
  * hashes, so DuckDB reproduces the sketch (k smallest distinct h60)
  * bit-for-bit and the GATE hash-compares the estimate's integer
  * sufficient statistics at every SF.
  *
  * Returns the sketch itself: the distinct minima ASCENDING (size < k
  * iff the input had fewer than k distinct values — in that regime the
  * sketch IS the exact distinct set and the consumer reads |sketch| as
  * the exact count).
  */
case class KMinDistinctLong(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k > 0, s"need k > 0, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmin_distinct requires BIGINT input, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def push(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit =
    if (buf.size < k) { buf.add(v); () } // TreeSet dedups
    else if (v < buf.last() && buf.add(v)) { buf.pollLast(); () }

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) push(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long])
      : java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) push(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator() // TreeSet iterates ascending
    var i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) out.writeLong(it.next())
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf.add(in.readLong()))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KMinDistinctLong =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KMinDistinctLong =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KMinDistinctLong =
    copy(child = newChildren.head)
  override def prettyName: String = "kmin_distinct"
}

object KMinDistinct {
  /** Column form: the k smallest distinct values, ascending. */
  def kminDistinctLong(c: Column, k: Int): Column =
    Bridge.toColumn(
      KMinDistinctLong(Bridge.toExpression(c), k).toAggregateExpression())
}
