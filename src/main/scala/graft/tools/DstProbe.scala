package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway A/B probe for the iteration-aggregation layout question:
  * the contribJoin shape (`edges ⋈ broadcast(rank) groupBy dst`) over
  * the SRC-bucketed at-rest table pays a per-iteration Exchange of the
  * dst-keyed partial aggregates; a DST-bucketed copy of the same
  * symmetric relation would make the final aggregate bucket-local
  * (zero Exchange above the scan). This times the isolated stage both
  * ways, alternating reps, before any engine change is committed.
  * Usage: runMain graft.tools.DstProbe [sfDir] [reps]
  */
object DstProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_testdata/sf10")
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val s = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "2m")
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val sym = graft.ops.Graph.symEdgeRelation(s, sfDir).select(col("src"), col("dst"))
    // per-process unique name (the R6 rule — a fixed name would let two
    // concurrent probes, or a probe alongside Verify/Bench, delete each
    // other's live bucket files), dropped in a finally so a crashed probe
    // can't leak a GB-scale table the symedges reaper never matches
    val t = s"graft_probe_dst_symedges_${java.lang.ProcessHandle.current().pid()}"
    try {
      val buckets = 32
      val t0 = System.nanoTime()
      sym.repartition(buckets, col("dst"))
        .write.mode("overwrite").bucketBy(buckets, "dst").sortBy("dst").saveAsTable(t)
      println(f"[probe] dst table build ${(System.nanoTime() - t0) / 1e9}%.1f s")
      val symD = s.table(t)
      val deg = sym.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
        .localCheckpoint(true)
      val mass = deg.select(col("node").as("src"),
        (lit(1000000000000L) / col("deg")).as("__m")).localCheckpoint(true)
      def arm(e: org.apache.spark.sql.DataFrame): Long =
        e.join(broadcast(mass), "src").groupBy(col("dst")).agg(sum(col("__m"))).count()
      for (i <- 1 to reps; (name, e) <- Seq("src-bucketed" -> sym, "dst-bucketed" -> symD)) {
        val a0 = System.nanoTime()
        val n = arm(e)
        println(f"[probe] rep=$i arm=$name rows=$n sec=${(System.nanoTime() - a0) / 1e9}%.2f")
      }
      println("[probe] dst-arm plan:")
      symD.join(broadcast(mass), "src").groupBy(col("dst")).agg(sum(col("__m")))
        .explain()
    } finally graft.ops.ScaleOps.dropTableAndDir(s, t)
    s.stop()
  }
}
