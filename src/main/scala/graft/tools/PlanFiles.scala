package graft.tools

import java.io.ByteArrayOutputStream
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Graph

/** Writes `.explain("formatted")` output for named queries to
  * `<outDir>/<name>_<suffix>.txt` — the per-query optimization evidence
  * committed under `plans/r15/`.
  *
  * Regular names resolve through [[graft.SparkEntry.queries]]. For the
  * iterative graph operators the registered query returns a per-round
  * checkpointed frame whose end-plan is a bare RDD scan, so each of those
  * files carries a second section: the PER-ROUND plan, produced by calling
  * the operator's own round helper ([[Graph.contribJoin]]) or mirroring
  * its loop body line-for-line (file:line cited in the section header).
  * Round sections are planned with `spark.sql.autoBroadcastJoinThreshold
  * = -1` because at the 100x SF the node-sized probes (~2M rows) sit past
  * the default auto-broadcast threshold — the explicit `broadcast()` rail
  * hints are exactly what the r15 change added, and killing the auto
  * threshold is what makes the sf0.001 plan show the sf10 regime.
  *
  * Usage: runMain graft.tools.PlanFiles <sfDir> <outDir> <suffix> <n1,n2,..>
  */
object PlanFiles {

  private def fmt(df: DataFrame): String = {
    val out = new ByteArrayOutputStream()
    Console.withOut(out) { df.explain("formatted") }
    out.toString("UTF-8").trim
  }

  /** (section title, plan text) list for one name. */
  private def sections(s: SparkSession, d: String, name: String): Seq[(String, String)] = {
    def registered = ("registered query plan (sf0.001, default confs)",
      fmt(graft.SparkEntry.queries(name)(s, d)))
    def noAutoBroadcast[A](body: => A): A = {
      val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try { s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1"); body }
      finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
    lazy val sym = Graph.symEdgeRelation(s, d).select(col("src"), col("dst"))
    lazy val symDst = Graph.symEdgeDstRelation(s, d).select(col("src"), col("dst"))
    lazy val outMass = sym.groupBy(col("src"))
      .count().select(col("src"), (col("count") * lit(1L)).as("__m"))
      .localCheckpoint(true)
    name match {
      case "graph_pagerank" | "graph_trustrank" =>
        val round = noAutoBroadcast {
          fmt(Graph.contribJoin(sym, outMass, 1L, Some(symDst)))
        }
        Seq(registered,
          ("in-rail contribution round — Graph.contribJoin(sym, outMass, nNodes<=rail, Some(symDst)); auto-broadcast killed to model the 100x probe size", round))
      case "graph_cc_labels" =>
        // mirrors Graph.minLabelRoundsSym's round body (Graph.scala:1295-1304)
        val labels = sym.select(col("src").as("node")).distinct()
          .withColumn("label", col("node")).localCheckpoint(true)
        val probe = labels.withColumnRenamed("node", "src")
          .withColumnRenamed("label", "plabel")
        val round = noAutoBroadcast {
          fmt(symDst.join(broadcast(probe), "src")
            .groupBy(col("dst").as("node")).agg(min(col("plabel")).as("nl")))
        }
        Seq(registered,
          ("in-rail min-label round — mirrors Graph.minLabelRoundsSym loop body (dst-twin scan + broadcast probe); auto-broadcast killed", round))
      case "graph_kcore" =>
        // mirrors Graph.kcorePeelSym's round body (Graph.scala:675-681)
        val nodes = sym.select(col("src").as("node")).distinct().localCheckpoint(true)
        def probe(c: String) = broadcast(nodes.withColumnRenamed("node", c))
        val round = noAutoBroadcast {
          fmt(sym.join(probe("src"), "src").join(probe("dst"), "dst")
            .groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
            .filter(col("deg") >= 2).select(col("node")))
        }
        Seq(registered,
          ("in-rail peel round — mirrors Graph.kcorePeelSym loop body (both node probes broadcast, src-bucket-local aggregate); auto-broadcast killed", round))
      case "graph_bfs_depth" =>
        // mirrors Graph.bfsDepthSym's round body (Graph.scala:1344-1353)
        val settled = sym.select(col("src").as("node")).distinct().limit(8)
          .select(col("node"), lit(0L).as("depth")).localCheckpoint(true)
        val frontier = settled.filter(col("depth") === 0L).select(col("node").as("src"))
        val round = noAutoBroadcast {
          fmt(symDst.join(broadcast(frontier), "src")
            .select(col("dst").as("node")).distinct()
            .join(broadcast(settled), Seq("node"), "left_anti")
            .select(col("node"), lit(1L).as("depth")))
        }
        Seq(registered,
          ("in-rail frontier expansion — mirrors Graph.bfsDepthSym loop body (dst-twin scan, broadcast frontier + broadcast anti-join); auto-broadcast killed", round))
      case n => Seq(registered)
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 4, "usage: PlanFiles <sfDir> <outDir> <suffix> <n1,n2,..>")
    val Array(sfDir, outDir, suffix, nameCsv) = args.take(4)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config(graft.functions.TypedArgExtremum.FallbackThresholdKey,
        graft.functions.TypedArgExtremum.FallbackThreshold)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    nameCsv.split(",").map(_.trim).filter(_.nonEmpty).foreach { n =>
      val sb = new StringBuilder
      sb ++= s"# $n ($suffix) — graft.tools.PlanFiles over $sfDir\n"
      sections(spark, sfDir, n).foreach { case (title, plan) =>
        sb ++= s"\n## $title\n\n$plan\n"
      }
      Files.writeString(Paths.get(outDir, s"${n}_$suffix.txt"), sb.toString)
      println(s"[planfiles] wrote $outDir/${n}_$suffix.txt")
    }
    spark.stop()
  }
}
