package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** `max_by`/`min_by` re-expressed as a `TypedImperativeAggregate` so the
  * argmax executes on the OBJECT-HASH aggregation path.
  *
  * Why this exists: Spark's builtin `max_by(value, key)` is a
  * `DeclarativeAggregate` whose buffer holds the key and value columns
  * themselves — the moment either is a struct / string / array, the buffer
  * is not UnsafeRow-mutable, `HashAggregateExec` is disqualified, and the
  * planner falls back to `SortAggregateExec`: the FULL input stream is
  * partition-sorted on the grouping keys just to fold an argmax that never
  * needed any order. The r12 packed-BIGINT trick (see
  * `Similarity.nnDedupLshAt`) fixes the sites whose ordering key packs
  * into 63 bits; THIS aggregate is the general fix for the sites whose
  * key+payload cannot pack (e.g. `events_compact_latest`: key =
  * (timestamp-micros 51 bits, event_id), payload carries a raw double).
  * A `TypedImperativeAggregate` routes through `ObjectHashAggregateExec`
  * — hash-grouped with map-side partial aggregation, no sort — at the
  * cost of one small heap object per group. Pair it with a raised
  * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` (default
  * 128 distinct keys per partition!) so high-cardinality groupings stay
  * on the hash path; buffers here are two boxed values per group, so
  * millions of per-partition groups fit comfortably.
  *
  * Semantics match `max_by`/`min_by`: rows with NULL ordering key are
  * ignored; ties are whatever the merge order yields — callers encode the
  * tiebreak INTO the key (all graft call sites do), which makes the
  * result deterministic. NaN orders greatest, like Spark sorts.
  */
case class TypedArgExtremum(
    value: Expression,
    key: Expression,
    isMax: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TypedArgExtremum.State] {

  override def children: Seq[Expression] = Seq(value, key)
  override def nullable: Boolean = true
  override def dataType: DataType = value.dataType

  override def checkInputDataTypes(): TypeCheckResult =
    TypeUtils.checkForOrderingExpr(key.dataType, prettyName)

  @transient private lazy val ordering = TypeUtils.getInterpretedOrdering(key.dataType)

  // (key, value) serializer for shuffle-exchanged partial buffers: one
  // UnsafeProjection over the pair schema — datatype-generic, no
  // per-field hand-rolled codec
  @transient private lazy val pairProj =
    UnsafeProjection.create(Array(key.dataType, value.dataType))
  @transient private lazy val pairRow = new UnsafeRow(2)

  override def createAggregationBuffer(): TypedArgExtremum.State =
    new TypedArgExtremum.State

  private def better(candidate: Any, incumbent: Any): Boolean = {
    val c = ordering.compare(candidate, incumbent)
    if (isMax) c > 0 else c < 0
  }

  override def update(buf: TypedArgExtremum.State, input: InternalRow): TypedArgExtremum.State = {
    val k = key.eval(input)
    if (k != null && (!buf.set || better(k, buf.key))) {
      // eval results may alias reusable row buffers — copy before keeping
      buf.key = InternalRow.copyValue(k)
      buf.value = InternalRow.copyValue(value.eval(input))
      buf.set = true
    }
    buf
  }

  override def merge(buf: TypedArgExtremum.State, other: TypedArgExtremum.State): TypedArgExtremum.State = {
    if (other.set && (!buf.set || better(other.key, buf.key))) {
      buf.key = other.key
      buf.value = other.value
      buf.set = true
    }
    buf
  }

  override def eval(buf: TypedArgExtremum.State): Any =
    if (buf.set) buf.value else null

  override def serialize(buf: TypedArgExtremum.State): Array[Byte] =
    if (!buf.set) Array.emptyByteArray
    else {
      // getBytes returns the projection's REUSED backing array when the
      // row exactly fills it — copy so two serialized buffers can never
      // alias (the framework usually consumes each result before the
      // next call, but that's its implementation detail, not a contract)
      val row = pairProj(InternalRow(buf.key, buf.value))
      java.util.Arrays.copyOf(row.getBytes, row.getSizeInBytes)
    }

  override def deserialize(bytes: Array[Byte]): TypedArgExtremum.State = {
    val buf = new TypedArgExtremum.State
    if (bytes.nonEmpty) {
      pairRow.pointTo(bytes, bytes.length)
      // values read out of an UnsafeRow alias its byte array; the array is
      // private to this buffer but copy anyway so the state never depends
      // on the row wrapper's lifetime
      buf.key = InternalRow.copyValue(pairRow.get(0, key.dataType))
      buf.value = InternalRow.copyValue(pairRow.get(1, value.dataType))
      buf.set = true
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TypedArgExtremum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TypedArgExtremum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TypedArgExtremum =
    copy(value = newChildren(0), key = newChildren(1))
  override def prettyName: String = if (isMax) "typed_max_by" else "typed_min_by"
}

object TypedArgExtremum {
  /** Mutable per-group argmax state: the current best key and its payload. */
  final class State {
    var set: Boolean = false
    var key: Any = null
    var value: Any = null
  }

  /** The conf that keeps `ObjectHashAggregateExec` hash-based past 128
    * distinct per-partition groups — every graft session sets it to this.
    */
  val FallbackThresholdKey = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
  val FallbackThreshold = (1 << 22).toString

  def typed_max_by(value: Column, key: Column): Column =
    Bridge.toColumn(TypedArgExtremum(
      Bridge.toExpression(value), Bridge.toExpression(key), isMax = true).toAggregateExpression())

  def typed_min_by(value: Column, key: Column): Column =
    Bridge.toColumn(TypedArgExtremum(
      Bridge.toExpression(value), Bridge.toExpression(key), isMax = false).toAggregateExpression())
}
