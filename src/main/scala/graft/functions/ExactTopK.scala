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

/** EXACT multiset top-k of a BIGINT column as a bounded-heap
  * `TypedImperativeAggregate` — the scale-correct replacement for the
  * window formulation of per-group top-k.
  *
  * `row_number() OVER (PARTITION BY g ORDER BY v DESC) <= k` SORTS every
  * group in full: per-group cost O(n log n) and, under a WindowExec, the
  * whole partition's rows flow through the sort regardless of k. This
  * aggregate holds a k-slot min-heap per partial — O(k) state, O(log k)
  * per row, map-side combined before the shuffle like any agg — so only
  * k values per (partition, group) ever cross the wire. Merge is
  * associative (heap union + trim), eval emits the values sorted
  * descending. Result is the exact multiset of the k largest values
  * (duplicates retained), which is precisely what the window form
  * produces when only the VALUES are kept.
  *
  * The approximate sibling is [[SpaceSavingTopK]] (top-k by FREQUENCY
  * under unbounded cardinality); this one is top-k by VALUE, exact.
  */
case class ExactTopKLong(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[java.lang.Long]] {

  require(k > 0, s"need k > 0, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"exact_topk requires BIGINT input, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): java.util.PriorityQueue[java.lang.Long] =
    new java.util.PriorityQueue[java.lang.Long]() // natural order = min-heap

  private def push(buf: java.util.PriorityQueue[java.lang.Long], v: Long): Unit =
    if (buf.size < k) buf.add(v)
    else if (v > buf.peek()) { buf.poll(); buf.add(v) }

  override def update(
      buf: java.util.PriorityQueue[java.lang.Long],
      input: InternalRow): java.util.PriorityQueue[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) push(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      buf: java.util.PriorityQueue[java.lang.Long],
      other: java.util.PriorityQueue[java.lang.Long])
      : java.util.PriorityQueue[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) push(buf, it.next())
    buf
  }

  override def eval(buf: java.util.PriorityQueue[java.lang.Long]): Any = {
    val arr = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    java.util.Arrays.sort(arr)
    // descending
    val out = new Array[Any](arr.length)
    var j = 0
    while (j < arr.length) { out(j) = arr(arr.length - 1 - j); j += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.PriorityQueue[java.lang.Long]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) out.writeLong(it.next())
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf.add(in.readLong()))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ExactTopKLong =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ExactTopKLong =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ExactTopKLong =
    copy(child = newChildren.head)
  override def prettyName: String = "exact_topk"
}

object ExactTopK {
  /** Column form: exact multiset top-k (descending) of a BIGINT column. */
  def exactTopKLong(c: Column, k: Int): Column =
    Bridge.toColumn(
      ExactTopKLong(Bridge.toExpression(c), k).toAggregateExpression())
}
