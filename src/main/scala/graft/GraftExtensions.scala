package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.IntegerType

import graft.functions.{CdcBoundaries, CosineSim, ExactTopKLong, KMinDistinctLong, Md5Hash60, NGrams, NormalizeScrub, RollingHash61, SpaceSavingTopK, TokenFreqStats}

/** SQL registration of the engine's native Catalyst expressions, so
  * `spark.sql("SELECT md5hash60(text) ...")` works like a built-in:
  *
  *  - at session BUILD time via `spark.sql.extensions=graft.GraftExtensions`
  *    (or `.withExtensions(new GraftExtensions)`) — the deployment path;
  *  - on a LIVE session via [[GraftExtensions.register]] — the path the
  *    registered queries use, since the driver hands them an already-built
  *    session.
  *
  * All are native expressions (codegen'd scalar ops, a
  * TypedImperativeAggregate for the sketch, a Generator for shingling) —
  * registering them does not introduce any UDF boundary into the plan.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name), builder))
    }
    // the engine's optimizer extension: automatic runtime bloom
    // prefilters on qualifying semi joins (production thresholds — the
    // statistics guards keep it away from plans too small to pay for a
    // bloom build). Injected as a PRE-CBO rule — a `Once` batch AFTER
    // the fixed-point operator-optimization batches — for the same
    // reason Spark's own InjectRuntimeFilter runs in its own Once batch:
    // inside the fixed point, InferFiltersFromConstraints copies the
    // injected might_contain across the join's equality constraint onto
    // the build side (a wasted self-probe), and interleaved rules
    // re-separating the Filter from the join child would stress the
    // idempotence guard every iteration. After the fixed point, the
    // rewrite happens exactly once on the settled plan. The live-session
    // path is spark.experimental.extraOptimizations (see
    // q_ext_rule_bloom).
    ext.injectPreCBORule(_ => new graft.rules.BloomSemiJoinPrefilter())
  }
}

object GraftExtensions {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an INT literal, got $other")
  }

  /** name → builder for every SQL-exposed native function. */
  val functions: Seq[(String, FunctionBuilder)] = Seq(
    "md5hash60" -> { args =>
      require(args.size == 1, "md5hash60(expr)")
      Md5Hash60(args.head)
    },
    "rolling_hash61" -> { args =>
      require(args.size == 1, "rolling_hash61(expr)")
      RollingHash61(args.head)
    },
    "cosine_sim" -> { args =>
      require(args.size == 2, "cosine_sim(a, b)")
      CosineSim(args(0), args(1))
    },
    "space_saving_topk" -> { args =>
      require(args.size == 3, "space_saving_topk(expr, k, capacity)")
      SpaceSavingTopK(args.head, intLit(args(1), "k"), intLit(args(2), "capacity"))
    },
    "exact_topk" -> { args =>
      require(args.size == 2, "exact_topk(expr, k)")
      ExactTopKLong(args.head, intLit(args(1), "k"))
    },
    "kmin_distinct" -> { args =>
      require(args.size == 2, "kmin_distinct(expr, k)")
      KMinDistinctLong(args.head, intLit(args(1), "k"))
    },
    "normalize_scrub" -> { args =>
      require(args.size == 1, "normalize_scrub(text)")
      NormalizeScrub(args.head)
    },
    "token_freq_stats" -> { args =>
      require(args.size == 1, "token_freq_stats(arr)")
      TokenFreqStats(args.head)
    },
    "bpe_token_counts" -> { args =>
      require(args.size == 1, "bpe_token_counts(text)")
      graft.functions.BpeTokenCounts(args.head)
    },
    "cdc_boundaries" -> { args =>
      require(args.size == 3, "cdc_boundaries(expr, window, mask)")
      CdcBoundaries(args.head, intLit(args(1), "window"), intLit(args(2), "mask").toLong)
    },
    "ngrams" -> { args =>
      require(args.size == 2, "ngrams(text, n)")
      NGrams(args.head, intLit(args(1), "n"))
    })

  /** Register every function on a live session (idempotent). Also pins
    * the ObjectHashAggregate fallback threshold ([[graft.functions
    * .TypedArgExtremum]]'s Scaladoc): a consumer session that attaches
    * graft here but skips the per-main builder conf would otherwise
    * silently degrade every typed-argmax aggregate to sort-based
    * aggregation past 128 per-partition groups — the exact defect class
    * the aggregate exists to remove. Central because this is the one
    * choke point every live-session attach path goes through.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.conf.set(graft.functions.TypedArgExtremum.FallbackThresholdKey,
      graft.functions.TypedArgExtremum.FallbackThreshold)
    // trust bucketed tables' sortBy at scan time (single-file buckets) —
    // the graft bucketed artifacts depend on it for their sort-free SMJ
    // consumption; set here (and in the mains' builders) so plan shapes
    // never depend on WHEN the first bucketed artifact was touched
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    functions.foreach { case (name, b) => Bridge.registerFunction(spark, name, b) }
  }
}
