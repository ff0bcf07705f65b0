package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass bounded-memory top-k by frequency: the Space-Saving sketch
  * (Metwally et al., "Efficient computation of frequent and top-k elements
  * in data streams", ICDT 2005) as a Catalyst `TypedImperativeAggregate`.
  *
  * The composable top-k (`groupBy(v).count().orderBy().limit(k)`,
  * SURVEY.md A13) shuffles one row per DISTINCT value — the right plan
  * until value cardinality explodes. This aggregate holds at most
  * `capacity` counters per partition, merges associatively, and returns
  * `array<struct<value,count,error>>`: count is an overestimate by at most
  * `error`, and when `capacity ≥ |distinct values|` every error is 0 and
  * the result is EXACT (which is how the driver's DuckDB oracle checks it
  * on the test tables).
  *
  * State per partial: `capacity` (value, count, error) triples — constant
  * memory regardless of input rows, the 100 TB shape SURVEY §4.4 reserves
  * a `TypedImperativeAggregate` for.
  */
case class SpaceSavingTopK(
    child: Expression,
    k: Int,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, (Long, Long)]] {

  require(k > 0 && capacity >= k, s"need capacity ≥ k > 0, got k=$k capacity=$capacity")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("value", StringType),
    StructField("count", LongType),
    StructField("error", LongType))))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"space_saving_topk requires STRING input, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): mutable.HashMap[String, (Long, Long)] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[String, (Long, Long)],
      input: InternalRow): mutable.HashMap[String, (Long, Long)] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[UTF8String].toString, 1L, 0L)
    buf
  }

  override def merge(
      buf: mutable.HashMap[String, (Long, Long)],
      other: mutable.HashMap[String, (Long, Long)]): mutable.HashMap[String, (Long, Long)] = {
    other.foreach { case (v, (c, e)) => add(buf, v, c, e) }
    buf
  }

  /** Space-Saving insert: increment if tracked, insert if room, otherwise
    * displace the minimum counter (its count becomes the new entry's error
    * bound).
    */
  private def add(
      buf: mutable.HashMap[String, (Long, Long)], v: String, c: Long, e: Long): Unit =
    buf.get(v) match {
      case Some((c0, e0)) => buf.update(v, (c0 + c, e0 + e))
      case None if buf.size < capacity => buf.update(v, (c, e))
      case None =>
        val (minV, (minC, _)) = buf.minBy { case (value, (cnt, _)) => (cnt, value) }
        buf.remove(minV)
        buf.update(v, (minC + c, minC + e))
    }

  override def eval(buf: mutable.HashMap[String, (Long, Long)]): Any = {
    val top = buf.toSeq
      .sortBy { case (v, (c, _)) => (-c, v) } // deterministic tie-break
      .take(k)
      .map { case (v, (c, e)) =>
        InternalRow(UTF8String.fromString(v), c, e)
      }
    new GenericArrayData(top.toArray[Any])
  }

  // Values are length-prefixed raw UTF-8 (writeInt(len) + bytes), NOT
  // writeUTF: writeUTF throws UTFDataFormatException past 65535 encoded
  // bytes, and the aggregate accepts arbitrary STRING input — a long
  // tracked value must not crash shuffle serialization of partial buffers.
  override def serialize(buf: mutable.HashMap[String, (Long, Long)]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.foreach { case (v, (c, e)) =>
      val vb = v.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(vb.length); out.write(vb)
      out.writeLong(c); out.writeLong(e)
    }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, (Long, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, (Long, Long)]
    (0 until n).foreach { _ =>
      val vb = new Array[Byte](in.readInt())
      in.readFully(vb)
      val v = new String(vb, java.nio.charset.StandardCharsets.UTF_8)
      val c = in.readLong(); val e = in.readLong()
      buf.update(v, (c, e))
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SpaceSavingTopK =
    copy(child = newChildren.head)
  override def prettyName: String = "space_saving_topk"
}

object SpaceSavingTopK {
  /** Column form: single-pass approximate top-k of a string column. */
  def topKFreq(c: Column, k: Int, capacity: Int): Column =
    Bridge.toColumn(
      SpaceSavingTopK(Bridge.toExpression(c), k, capacity).toAggregateExpression())
}
