package graft.tools

import org.apache.spark.sql.SparkSession

import graft.ops._

/** Scratch profiling harness: time any registered query (or the staged
  * internals of dedup_lsh_pairs) against a testdata dir.
  * Usage: runMain graft.tools.Profile <sfDir> <queryName|lsh_stages>
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val what = args(1)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("PROFILE_MASTER", "local[8]"))
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("PROFILE_SHUFFLE", "8"))
      .config(graft.functions.TypedArgExtremum.FallbackThresholdKey,
        graft.functions.TypedArgExtremum.FallbackThreshold)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    what match {
      case "lsh_stages" =>
        val docs = Tables.documents(spark, sfDir)
        val sh = Dedup.shingles1(docs)
        time("shingles1.count")(println(sh.count()))
        val sig = Dedup.minhashSignature(sh)
        time("sig.count")(println(sig.count()))
        val bands = Dedup.lshBands(sig)
        time("bands.count")(println(bands.count()))
        val left = bands.select(
          org.apache.spark.sql.functions.col("doc_id").as("doc_a"),
          org.apache.spark.sql.functions.col("band"),
          org.apache.spark.sql.functions.col("band_hash"))
        val right = bands.select(
          org.apache.spark.sql.functions.col("doc_id").as("doc_b"),
          org.apache.spark.sql.functions.col("band"),
          org.apache.spark.sql.functions.col("band_hash"))
        val pairs = left.join(right, Seq("band", "band_hash"))
          .filter(org.apache.spark.sql.functions.col("doc_a") <
            org.apache.spark.sql.functions.col("doc_b"))
        time("pairs.count")(println(pairs.count()))
        val dp = pairs.select("doc_a", "doc_b").distinct()
        time("pairs.distinct.count")(println(dp.count()))
        time("full query.count")(println(Dedup.lshCandidatePairs(docs).count()))
        time("full query again")(println(Dedup.lshCandidatePairs(docs).count()))
      case "clusters_stages" =>
        import org.apache.spark.sql.functions._
        val docs = Tables.documents(spark, sfDir)
        val edges = time("edges (lshCandidatePairs)")(Dedup.lshCandidatePairs(docs))
        val sym = time("sym checkpoint") {
          edges.select(col("doc_a").as("src"), col("doc_b").as("dst"))
            .union(edges.select(col("doc_b").as("src"), col("doc_a").as("dst")))
            .localCheckpoint(true)
        }
        println(s"edge rows: ${sym.count()}")
        var labels = time("labels init") {
          sym.select(col("src").as("doc_id")).distinct()
            .withColumn("label", col("doc_id")).localCheckpoint(true)
        }
        var converged = false
        var iter = 0
        while (!converged && iter < 64) {
          time(s"iteration $iter") {
            val neighborMin = sym
              .join(labels.withColumnRenamed("doc_id", "dst"), "dst")
              .groupBy(col("src").as("doc_id"))
              .agg(min(col("label")).as("nlabel"))
            val next = labels.join(neighborMin, Seq("doc_id"), "left")
              .select(col("doc_id"), col("label").as("old"),
                least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
              .localCheckpoint(true)
            converged = next.filter(col("label") =!= col("old")).isEmpty
            labels = next.select(col("doc_id"), col("label"))
          }
          iter += 1
        }
        println(s"iterations: $iter")
      case "seq" =>
        // args(2..): query names, run in order in ONE session — reproduces
        // bench-style shared-JVM behavior.
        args.drop(2).foreach { name =>
          val q = graft.SparkEntry.registry.find(_.name == name).get
          time(name)(println(q.run(spark, sfDir).count()))
        }
      case name =>
        val q = graft.SparkEntry.registry.find(_.name == name).get
        val df = q.run(spark, sfDir)
        time(s"$name (1st)")(println(df.count()))
        time(s"$name (2nd)")(println(q.run(spark, sfDir).count()))
        df.explain("formatted")
    }
    spark.stop()
  }
}
