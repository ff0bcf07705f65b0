package graft.tools

import org.apache.spark.sql.SparkSession

/** Driver-style smoke: SparkEntry.entry must return rows > 0 on sf0.001. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config(graft.functions.TypedArgExtremum.FallbackThresholdKey,
        graft.functions.TypedArgExtremum.FallbackThreshold)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"[entry-smoke] rows=$n")
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
