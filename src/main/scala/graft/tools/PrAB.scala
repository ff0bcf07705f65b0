package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B of the broadcast-rank vs shuffle-join iteration strategies shared
  * by [[graft.ops.Graph.pagerank]] and [[graft.ops.Graph.trustrank]],
  * inside ONE JVM, alternating reps so host-throttle windows hit both
  * arms, with a single-thread calibration canary printed per rep to make
  * any residual skew attributable.
  * Usage: runMain graft.tools.PrAB [queryName] [sfDir] [reps]
  * (queryName defaults to graph_pagerank; graph_trustrank shares the
  * same graft.pagerank.broadcastNodes guard at Graph.scala:383)
  */
object PrAB {
  private def calibrate(): Double = {
    val t0 = System.nanoTime()
    var h = 0L
    var i = 0L
    while (i < 300000000L) { h = h * 6364136223846793005L + i; i += 1 }
    if (h == 42L) println(h)
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    // Back-compat arg parse: args(0) is a query name only when the
    // registry actually contains it; anything else (absolute OR relative
    // path — ADVICE r11: startsWith("/") misread a relative sfDir as a
    // query name) is sfDir, the r10 positional shape.
    val named = args.nonEmpty && graft.SparkEntry.queries.contains(args(0))
    val query = if (named) args(0) else "graph_pagerank"
    val rest = if (named) args.drop(1) else args
    val sfDir = if (rest.nonEmpty) rest(0) else "/tmp/graft_testdata/sf10"
    val reps = if (rest.length > 1) rest(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "2m")
      .config(graft.functions.TypedArgExtremum.FallbackThresholdKey,
        graft.functions.TypedArgExtremum.FallbackThreshold)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(query)
    fn(spark, sfDir).count() // build + latch the edge artifact outside the timings
    for (i <- 1 to reps; mode <- Seq("bcast", "smj")) {
      System.setProperty("graft.pagerank.broadcastNodes",
        if (mode == "bcast") "4000000" else "-1")
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[ab] query=$query mode=$mode rep=$i rows=$n sec=$sec%.3f calib=${calibrate()}%.3f")
    }
    spark.stop()
  }
}
