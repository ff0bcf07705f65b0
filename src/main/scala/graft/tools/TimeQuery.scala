package graft.tools

import org.apache.spark.sql.SparkSession

/** Times one registered query N times in a single JVM (isolates query
  * cost from sbt/JVM startup, shows warm-run convergence).
  * Usage: runMain graft.tools.TimeQuery <name> [sfDir] [reps]
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // split-range cap sized for the local SFs: the scale-up tables are
      // single FILES with 2 MB row groups, and the default 128 MB range
      // would put a whole 80 MB table in one scan task
      .config("spark.sql.files.maxPartitionBytes", "2m")
      .config(graft.functions.TypedArgExtremum.FallbackThresholdKey,
        graft.functions.TypedArgExtremum.FallbackThreshold)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[time] $name rep=$i rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    spark.stop()
  }
}
