package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway probe: print reduce-partition byte sizes of the skew-join
  * shuffle at a given SF (debugging OptimizeSkewedJoin thresholds).
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config(graft.functions.TypedArgExtremum.FallbackThresholdKey,
        graft.functions.TypedArgExtremum.FallbackThreshold)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.ops.ScaleOps.withSkewJoinConfs(spark) {
      val df = graft.ops.ScaleOps.aqeSkewJoinPlan(spark, sf)
      df.collect()
      val plan = df.queryExecution.executedPlan
      // walk the adaptive plan for shuffle stages and dump their mapStats
      def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
        p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            walk(a.executedPlan)
          case s: org.apache.spark.sql.execution.adaptive.ShuffleQueryStageExec =>
            val st = s.mapStats
            println(s"stage ${s.id}: " + st.map(_.bytesByPartitionId.mkString(",")).getOrElse("none"))
            walk(s.plan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            walk(q.plan)
          case _ =>
        }
        p.children.foreach(walk)
        p.subqueries.foreach(walk)
      }
      walk(plan)
      println(plan.toString.linesIterator.take(40).mkString("\n"))
    }
    spark.stop()
  }
}
