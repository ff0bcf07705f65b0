package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  AttributeReference, GenericInternalRow, JoinedRow, RowOrdering, SortOrder,
  UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution,
  ClusteredDistribution, Distribution, IdentityBroadcastMode, Partitioning,
  UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** A NATIVE as-of join — the full custom-operator extension stack
  * (logical plan → planner strategy → physical operator), for the one
  * relational operator this engine needs that Spark's built-ins cannot
  * express directly: "for every left row, the single most recent right
  * row with the same key at or before the left row's time" (pandas
  * `merge_asof`, QuestDB/kdb ASOF JOIN).
  *
  * The composed form ([[graft.ops.ScaleOps.asofJoin]]: union + one
  * key-shuffle + running `last(ignoreNulls)` window) stays the reference
  * semantics — this operator exists because the native plan is strictly
  * leaner at scale: each side shuffles ONCE on the key (no union row
  * blow-up mixing both schemas through one exchange), each partition
  * sorts its own side (two smaller sorts instead of one over the union),
  * and the per-partition merge streams both sorted iterators with O(1)
  * state — one candidate row per key — where the window operator buffers
  * frames. Distribution/ordering requirements are declared, not
  * hand-built: EnsureRequirements plants the exchanges and sorts, so AQE
  * still re-plans the shuffles it owns.
  *
  * Match semantics mirror the composed operator exactly: right rows at
  * `ts == left.ts` are visible, and among right ties on ts the greatest
  * `tieBreak` wins (right side is sorted by (key, ts, tie); the merge
  * keeps the last row consumed). Rows with NULL keys or times follow
  * Spark's ascending-nulls-first sort; the synthetic tables carry no
  * null keys/times, and the oracle pins the live behavior.
  */
final case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    key: Seq[String],
    time: String,
    tieBreak: String,
    rightVals: Seq[String],
    valAttrs: Seq[Attribute],
    broadcastRight: Boolean = false) extends BinaryNode {
  // valAttrs (the emitted `asof_<name>` columns, nullable) are CONSTRUCTOR
  // state, not derived: a lazy val would mint fresh exprIds on every
  // transformation copy() and dangle the already-resolved parent plan.

  override def output: Seq[Attribute] = left.output ++ valAttrs

  /** The node has no expressions, so the default (expression-derived)
    * references are EMPTY — ColumnPruning would then strip the children
    * to nothing and the name-based contract would dangle. Declaring every
    * child column as referenced pins both schemas: the operator consumes
    * its children wholesale (callers size the sides — the DSL entry
    * pre-projects the right side; the left schema IS the output).
    */
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(
      left.output ++ right.output)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Planner rule: resolves the name-based contract against the children's
  * attributes and hands the physical operator its exact output attrs (the
  * logical node's exprIds must survive into the physical plan).
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsOfJoin =>
      def la(n: String) = j.left.output.find(_.name == n).get
      def ra(n: String) = j.right.output.find(_.name == n).get
      val exec =
        if (j.broadcastRight)
          AsOfJoinBroadcastExec(
            j.key.map(la), j.key.map(ra), la(j.time), ra(j.time), ra(j.tieBreak),
            j.rightVals.map(ra), j.left.output ++ j.valAttrs,
            planLater(j.left), planLater(j.right))
        else
          AsOfJoinExec(
            j.key.map(la), j.key.map(ra), la(j.time), ra(j.time), ra(j.tieBreak),
            j.rightVals.map(ra), j.left.output ++ j.valAttrs,
            planLater(j.left), planLater(j.right))
      exec :: Nil
    case _ => Nil
  }

  /** Idempotently registers this strategy on a LIVE session via the public
    * `experimental.extraStrategies` hook (the post-construction
    * counterpart of `SparkSessionExtensions.injectPlannerStrategy` —
    * the driver hands queries an already-built session).
    */
  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(this))
      spark.experimental.extraStrategies = cur :+ this
  }
}

/** Per-partition streaming merge of two key-clustered, (key, time)-sorted
  * children. For each left row the candidate is the last right row seen
  * with the same key and time ≤ the left time — O(1) state, no frame
  * buffering, no codegen dependency (the operator is a deliberate
  * codegen boundary, like the built-in sort-merge join's outer paths).
  */
final case class AsOfJoinExec(
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    rightTie: Attribute,
    rightValsIn: Seq[Attribute],
    outAttrs: Seq[Attribute],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = outAttrs

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(a => SortOrder(a, Ascending)),
    (rightKeys :+ rightTime :+ rightTie).map(a => SortOrder(a, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTime = leftTime
    val rTime = rightTime
    val rVals = rightValsIn
    val nVals = rightValsIn.length
    val out = outAttrs
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTime), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTime), rOut)
      val rValProj = UnsafeProjection.create(rVals, rOut)
      val outProj = UnsafeProjection.create(out, out)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      val nullVals = new GenericInternalRow(nVals)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        // head of the right side: projections copied (projection rows are
        // reused buffers; the source row stays valid until the next
        // rIter.next(), so the value projection runs lazily on consume)
        private var rRow: InternalRow = _
        private var rKey: InternalRow = _
        private var rTimeRow: InternalRow = _
        private var rLoaded = false
        // candidate = last right row consumed for the current key
        private var candKey: InternalRow = _
        private var candVals: InternalRow = _

        private def loadRight(): Unit =
          if (!rLoaded && rIter.hasNext) {
            rRow = rIter.next()
            rKey = rKeyProj(rRow).copy()
            rTimeRow = rTimeProj(rRow).copy()
            rLoaded = true
          }

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = lKeyProj(l)
          val lt = lTimeProj(l)
          var advancing = true
          while (advancing) {
            loadRight()
            if (!rLoaded) advancing = false
            else {
              val kc = keyOrd.compare(rKey, lk)
              if (kc < 0) rLoaded = false // right key already passed: discard
              else if (kc == 0 && timeOrd.compare(rTimeRow, lt) <= 0) {
                candKey = rKey
                candVals = rValProj(rRow).copy()
                rLoaded = false
              } else advancing = false
            }
          }
          val vals =
            if (candKey != null && keyOrd.compare(candKey, lk) == 0) candVals
            else nullVals
          outProj(joined(l, vals))
        }
      }
    }
  }
}

/** Broadcast as-of join: the shape for the dominant 100 TB case — a huge
  * fact stream enriched point-in-time against a SMALL right side (rates,
  * dimension snapshots, config history). The fact side is NOT shuffled and
  * NOT sorted: `EnsureRequirements` plants one `BroadcastExchange`
  * (identity mode) for the right, each task sorts the broadcast rows once
  * by (key, time, tie) and answers every left row with an upper-bound
  * binary search — O(log r) per row, zero exchanges on the left, input
  * partitioning/ordering preserved for downstream reuse. Same match
  * semantics as [[AsOfJoinExec]] (time-inclusive, greatest tieBreak wins):
  * the search returns the LAST entry with key == lk and time ≤ lt, which
  * under ascending (key, time, tie) order is exactly the max-time /
  * max-tie candidate.
  */
final case class AsOfJoinBroadcastExec(
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    rightTie: Attribute,
    rightValsIn: Seq[Attribute],
    outAttrs: Seq[Attribute],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = outAttrs

  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: BroadcastDistribution(IdentityBroadcastMode) :: Nil

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinBroadcastExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val tieType = rightTie.dataType
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTime = leftTime
    val rTime = rightTime
    val rTie = rightTie
    val rVals = rightValsIn
    val nVals = rightValsIn.length
    val out = outAttrs
    val rBc = right.executeBroadcast[Array[InternalRow]]()
    // The broadcast mode is correct ONLY while the build side is
    // dimension-sized — a data-proportional right side makes the
    // broadcast itself the scale failure (every task re-sorts it, every
    // executor holds it). That contract was previously a Scaladoc note;
    // now it is enforced at the one place the cardinality is already
    // known for free: the driver-side broadcast value, before any task
    // launches (r12 verdict item 2 — the registry's last unguarded
    // scale-killer). Past the rail the query fails loudly and names the
    // shuffle-mode operator that handles unbounded right sides.
    val buildRows = rBc.value.length
    val rail = conf.getConfString(AsOfJoinNative.MaxBroadcastBuildRowsKey,
      AsOfJoinNative.MaxBroadcastBuildRows.toString).toLong
    require(buildRows <= rail,
      s"as-of broadcast build side has $buildRows rows > rail $rail " +
        s"(${AsOfJoinNative.MaxBroadcastBuildRowsKey}) - the right side " +
        "is not dimension-sized; use the shuffle mode (broadcastRight = false)")
    left.execute().mapPartitions({ lIter =>
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      val tieOrd = RowOrdering.createNaturalAscendingOrdering(Seq(tieType))
      // Materialize (key, time, tie, vals) once per task and sort — the
      // broadcast side is small by contract (caller chose broadcast), so
      // the per-task sort prices like any broadcast-hash-join build side.
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTime), rOut)
      val rTieProj = UnsafeProjection.create(Seq(rTie), rOut)
      val rValProj = UnsafeProjection.create(rVals, rOut)
      val entries = rBc.value.map { r =>
        (rKeyProj(r).copy(), rTimeProj(r).copy(), rTieProj(r).copy(),
          rValProj(r).copy())
      }
      java.util.Arrays.sort(entries,
        new java.util.Comparator[(InternalRow, InternalRow, InternalRow, InternalRow)] {
          override def compare(
              a: (InternalRow, InternalRow, InternalRow, InternalRow),
              b: (InternalRow, InternalRow, InternalRow, InternalRow)): Int = {
            val kc = keyOrd.compare(a._1, b._1)
            if (kc != 0) kc
            else {
              val tc = timeOrd.compare(a._2, b._2)
              if (tc != 0) tc else tieOrd.compare(a._3, b._3)
            }
          }
        })
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTime), lOut)
      val outProj = UnsafeProjection.create(out, out)
      val nullVals = new GenericInternalRow(nVals)
      val joined = new JoinedRow
      lIter.map { l =>
        val lk = lKeyProj(l)
        val lt = lTimeProj(l)
        // upper bound: count of entries with key < lk, or key == lk and
        // time <= lt — the candidate (if its key matches) is at ub - 1.
        var lo = 0
        var hi = entries.length
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          val e = entries(mid)
          val kc = keyOrd.compare(e._1, lk)
          val le = kc < 0 || (kc == 0 && timeOrd.compare(e._2, lt) <= 0)
          if (le) lo = mid + 1 else hi = mid
        }
        val vals =
          if (lo > 0 && keyOrd.compare(entries(lo - 1)._1, lk) == 0) entries(lo - 1)._4
          else nullVals
        outProj(joined(l, vals))
      }
    }, preservesPartitioning = true)
  }
}

object AsOfJoinNative {
  /** Cardinality rail for [[AsOfJoinBroadcastExec]]: 2^24 (~16.8M) build
    * rows. Sized from the physics of the operator — every task holds and
    * binary-searches the full build array, so ~16M copied (key, time,
    * tie, vals) tuples ≈ low-GB heap per executor is the most a
    * "dimension-sized" side can defensibly mean; a build side tracking
    * the fact table (e.g. an unbounded purchase subset — the shape
    * ScaleOpsSpec's rail test pins) trips the rail long before it OOMs
    * an executor, with an error that points at the shuffle mode. The
    * registered q_asof_broadcast row feeds a FIXED top-1000 purchase
    * dimension, so it never approaches the rail at any SF.
    */
  val MaxBroadcastBuildRows: Int = 1 << 24
  /** Session-conf override of the rail (tests pin it low to exercise the
    * failure path without 16M rows; a deployment can widen it knowingly). */
  val MaxBroadcastBuildRowsKey = "spark.graft.asof.maxBroadcastBuildRows"

  /** DataFrame entry point: projects the right side to what the operator
    * consumes, registers the strategy on the live session, and builds the
    * logical node. Output = every left column, plus `asof_<v>` for each
    * requested right value column.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: Seq[String],
      time: String, tieBreak: String, rightVals: Seq[String],
      broadcastRight: Boolean = false): DataFrame = {
    import org.apache.spark.sql.functions.col
    val spark = left.sparkSession
    AsOfJoinStrategy.ensureRegistered(spark)
    val rCols = (key ++ Seq(time, tieBreak) ++ rightVals).distinct
    val rProj = right.select(rCols.map(col): _*)
    val rPlan = org.apache.spark.sql.graftbridge.Bridge.analyzedPlan(rProj)
    val valAttrs: Seq[Attribute] = rightVals.map { v =>
      val a = rPlan.output.find(_.name == v).getOrElse(
        throw new IllegalArgumentException(s"asof right column '$v' not found"))
      AttributeReference(s"asof_$v", a.dataType, nullable = true)()
    }
    org.apache.spark.sql.graftbridge.Bridge.ofRows(spark,
      AsOfJoin(
        org.apache.spark.sql.graftbridge.Bridge.analyzedPlan(left),
        rPlan, key, time, tieBreak, rightVals, valAttrs, broadcastRight))
  }
}
