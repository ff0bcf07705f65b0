package graft.tools

import org.apache.spark.sql.SparkSession

import graft.ops.{Similarity, Tables}

/** Measures ANN recall@10 vs brute force for the LSH and IVF paths. */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config(graft.functions.TypedArgExtremum.FallbackThresholdKey,
        graft.functions.TypedArgExtremum.FallbackThreshold)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.embeddings(spark, sfDir)
    val nProbes = 20
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(Similarity.knnBrute(emb, nProbes, 10))
    for (bits <- Seq(4, 6, 8)) {
      val lsh = pairs(Similarity.knnLsh(emb, nProbes, 10, bits))
      println(f"[recall] lsh bits=$bits recall@10=${(brute & lsh).size.toDouble / brute.size}%.3f")
    }
    for (tables <- Seq(2, 3, 4)) {
      val multi = pairs(Similarity.knnLshMulti(emb,
        emb.filter(org.apache.spark.sql.functions.col("vec_id") < nProbes)
          .select(org.apache.spark.sql.functions.col("vec_id").as("probe_id"),
            org.apache.spark.sql.functions.col("embedding")),
        10, bits = 4, tables = tables, excludeSelf = true))
      println(f"[recall] lsh-multi tables=$tables recall@10=${(brute & multi).size.toDouble / brute.size}%.3f")
    }
    for ((nlist, nprobe) <- Seq((16, 4), (16, 8), (32, 8))) {
      val ivf = pairs(Similarity.knnIvf(emb, nProbes, 10, nlist, nprobe))
      println(f"[recall] ivf nlist=$nlist nprobe=$nprobe recall@10=${(brute & ivf).size.toDouble / brute.size}%.3f")
    }
    for (iters <- Seq(2, 5); nprobe <- Seq(4, 8)) {
      val (cents, _) = Similarity.trainCentroids(emb, nlist = 16, iters = iters)
      val ivf = pairs(Similarity.knnIvf(emb, nProbes, 10, 16, nprobe, Some(cents)))
      println(f"[recall] ivf-kmeans iters=$iters nprobe=$nprobe recall@10=${(brute & ivf).size.toDouble / brute.size}%.3f")
    }
    spark.stop()
  }
}
