package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for the whole ScalaTest run. */
object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config(graft.functions.TypedArgExtremum.FallbackThresholdKey,
      graft.functions.TypedArgExtremum.FallbackThreshold)
    // bucketed artifacts' sortBy is trusted at scan (single-file buckets)
    .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    .getOrCreate()

  def resourcePath(name: String): String =
    getClass.getResource(name).getPath
}
