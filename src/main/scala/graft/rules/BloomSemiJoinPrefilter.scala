package graft.rules

import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, BloomFilterMightContain, EqualTo, Expression, ScalarSubquery, XxHash64}
import org.apache.spark.sql.catalyst.plans.LeftSemi
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule injecting a RUNTIME bloom prefilter into left-semi
  * equi-joins: when the build (right) side is small by table statistics
  * and the probe (left) side is large, the probe side gains
  * `Filter(might_contain(<scalar-subquery: bloom over build keys>,
  * xxhash64(probe key)))` — rows that cannot possibly join are dropped AT
  * THE SCAN, before the join's exchange, while the exact semi join above
  * removes the bloom's false positives, so the rewrite is semantically
  * invariant by construction. This is the same plan shape Spark's own
  * `InjectRuntimeFilter` emits, re-derived as a SESSION EXTENSION for the
  * cases the built-in rule declines (it requires shuffle-stage creation
  * heuristics that rarely fire on small/broadcastable builds, yet the
  * scan-side row cut still pays for itself whenever the probe scan is
  * expensive — the manual form is the registered `q_bloom_semi_join`;
  * this rule is that pattern applied automatically).
  *
  * Registered per-session via `spark.experimental.extraOptimizations`
  * (the "user provided optimizers" batch) — subqueries injected here are
  * planned by the standard PlanSubqueries preparation like any other.
  * Guards: statistics-based size test on both sides, single
  * `AttributeReference = AttributeReference` condition, and an
  * idempotence check so a prefiltered join never matches twice.
  */
class BloomSemiJoinPrefilter(
    buildMaxBytes: Long = 8L << 20,
    probeMinBytes: Long = 32L << 20) extends Rule[LogicalPlan] {

  /** True iff ANYWHERE in the probe subtree a bloom prefilter keyed on
    * this probe attribute already exists. The check must be
    * whole-subtree, not immediate-child: when the rule runs inside the
    * fixed-point operator-optimization batch (the `injectOptimizerRule`
    * deployment path), interleaved rules — ColumnPruning inserting a
    * Project, PushDownPredicates relocating the Filter toward the scan —
    * separate the injected Filter from the join child between
    * iterations, and an immediate-child guard would re-inject a
    * duplicate bloom scalar-subquery every iteration (each re-aggregating
    * the build side; in the worst case "Max iterations reached"
    * non-convergence). Keying on the probe attribute keeps the guard
    * precise: an unrelated bloom filter elsewhere in the tree does not
    * suppress a legitimate rewrite.
    */
  private def alreadyPrefiltered(p: LogicalPlan, probe: AttributeReference): Boolean =
    p.exists(_.expressions.exists(_.exists {
      case bf: BloomFilterMightContain =>
        bf.valueExpression.references.contains(probe)
      case _ => false
    }))

  private def sideKeys(cond: Expression, left: LogicalPlan, right: LogicalPlan)
      : Option[(AttributeReference, AttributeReference)] = cond match {
    case EqualTo(a: AttributeReference, b: AttributeReference) =>
      if (left.outputSet.contains(a) && right.outputSet.contains(b)) Some((a, b))
      else if (left.outputSet.contains(b) && right.outputSet.contains(a)) Some((b, a))
      else None
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, LeftSemi, Some(cond), _)
        if right.stats.sizeInBytes <= buildMaxBytes &&
          left.stats.sizeInBytes >= probeMinBytes =>
      sideKeys(cond, left, right) match {
        case Some((probeKey, buildKey)) if !alreadyPrefiltered(left, probeKey) =>
          val bloom = new BloomFilterAggregate(new XxHash64(Seq(buildKey)))
            .toAggregateExpression()
          val buildAgg = Aggregate(Nil, Seq(Alias(bloom, "graft_bloom")()), right)
          val prefilter = BloomFilterMightContain(
            ScalarSubquery(buildAgg), new XxHash64(Seq(probeKey)))
          j.copy(left = Filter(prefilter, left))
        case _ => j
      }
  }
}
