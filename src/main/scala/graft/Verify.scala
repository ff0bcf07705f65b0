package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // Optional third arg: comma-separated query-name filter (local iteration).
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    // Same guard as Bench's SPARK_GRAFT_BENCH_ONLY: a typo'd name would
    // silently produce a shorter dump that an adjudication script then
    // reads as "query missing" (or worse, never notices).
    only.foreach { o =>
      val unknown = o -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"query-name filter entries not in the registry: ${unknown.toSeq.sorted.mkString(",")}")
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // split-range cap sized for the local SFs: the scale-up tables are
      // single FILES with 2 MB row groups, and the default 128 MB range
      // would put a whole 80 MB table in one scan task
      .config("spark.sql.files.maxPartitionBytes", "2m")
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.functions.TypedArgExtremum.FallbackThresholdKey,
        graft.functions.TypedArgExtremum.FallbackThreshold)
      // bucketed artifacts' sortBy is trusted at scan (single-file buckets)
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Per-query engine timing with interference canaries (r12, verdict
    // item 2): the scale gates read spark_secs.json for an engine-side
    // per-query number at 10x/100x, the instrument that catches the next
    // correct-but-super-linear operator (the dedup_embedding_nn class) as
    // a NUMBER instead of a judge finding. Timing is "as executed by the
    // gate": plan + execute + single-file parquet write, min-of-1 — read
    // each value against its window canaries (same three instruments as
    // Bench, one shared definition in graft.tools.Canaries).
    import graft.tools.Canaries
    val CanaryEvery = 25
    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    // (name, seconds, canary window, pass-1 SUCCEEDED): the success flag
    // rides along so a pass-1 FAILURE duration can never enter the heavy
    // set or the published timings — min(failure duration, pass-2
    // success) would mix an error path into the regression instrument
    // (the mirror of the fast-pass-2-failure case guarded below).
    val timed = scala.collection.mutable.ArrayBuffer[(String, Double, Int, Boolean)]()
    // Queries whose pass-1 paid a FIRST-TIME artifact build (graph edge
    // tables, mm payload corpora, dedup edge sets — r14 verdict item 5):
    // the build seconds are published as their own `artifact_builds`
    // lines, and the contaminated query is forced into the second timed
    // pass so its published min is post-build regardless of sweep order.
    val buildContaminated = scala.collection.mutable.Set[String]()
    var canaries = Vector(Canaries.sample())
    qs.zipWithIndex.foreach { case ((name, fn), i) =>
      if (i > 0 && i % CanaryEvery == 0) canaries :+= Canaries.sample()
      val builds0 = graft.ops.ArtifactBuilds.count
      val t0 = System.nanoTime()
      val ok =
        try {
          fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
          true
        } catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
          false
        }
      timed += ((name, (System.nanoTime() - t0) / 1e9, i / CanaryEvery, ok))
      if (graft.ops.ArtifactBuilds.count > builds0) buildContaminated += name
    }
    canaries :+= Canaries.sample()
    // Heavy-query timings are MIN-OF-2 (r12 verdict item 4): per-query
    // numbers at the 100x point swung ±2x between min-of-1 sweeps
    // (q_aqe_skew_join 55.7↔207.0 s with identical code), so the
    // instrument that catches super-linear defects couldn't reliably
    // flag a 2x regression in a heavy query. The top 20 queries by
    // first-pass seconds (above a 5 s floor — below it the parquet
    // write dominates and totals already reproduce within ~2%) run a
    // second timed pass and the artifact keeps the min, with both raw
    // passes recorded so a sweep-vs-sweep comparison can see the spread.
    // Second-pass membership (r14 verdict items 2 + 5) = the heavy
    // top-20, PLUS every query whose pass-1 window canary exceeded 1.4×
    // the run floor on any instrument (sweep noise that previously
    // published un-patched: text_token_stats rode a 2.1× canary into the
    // r14 artifact), PLUS the fixed-size archive-fixture queries (their
    // inputs don't scale with SF, so ANY window inflation misreports —
    // r14 published 4.77 s for a 5-row fixture read), PLUS every
    // build-contaminated query (see above).
    val floorSingle = canaries.map(_.single).min
    val floorPar = canaries.map(_.par32).min
    val floorMem = canaries.map(_.mem).min
    def windowInflated(w: Int): Boolean = {
      val a = canaries(w)
      val b = canaries(math.min(w + 1, canaries.size - 1))
      math.max(a.single, b.single) > 1.4 * floorSingle ||
        math.max(a.par32, b.par32) > 1.4 * floorPar ||
        math.max(a.mem, b.mem) > 1.4 * floorMem
    }
    val fixedInput = Set(
      "q_s1_archive_core_read", "q_s1_archive_count_pushdown",
      "q_s2_archive_join",
      // the ~100 MB synthetic archive is SF-independent by construction
      // too — on a warm box its pass-1 pays no build, so without this it
      // could publish sub-1.4×-canary window inflation as a cross-SF
      // "regression" in a query whose input never changes
      "q_s1_archive_scale_count")
    val heavyTop = timed.filter(_._4).sortBy(-_._2)
      .filter(_._2 >= 5.0).take(20).map(_._1).toSet
    val canaryFlagged = timed.filter(_._4)
      .filter(t => windowInflated(t._3)).map(_._1).toSet
    val heavySet = heavyTop ++ canaryFlagged ++
      timed.filter(_._4).map(_._1).toSet
        .intersect(fixedInput ++ buildContaminated)
    val secondPass = scala.collection.mutable.LinkedHashMap[String, Double]()
    if (heavySet.nonEmpty) {
      // the re-run writes to a SCRATCH dir, never over the pass-1 dump:
      // overwrite mode deletes the target before writing, so a transient
      // second-pass failure would silently destroy a GOOD correctness
      // dump that the adjudicator then reads as a query failure. And the
      // elapsed time is recorded only on SUCCESS — a fast failure must
      // not become the published min (a 0.8 s error beating a 60 s pass
      // would read as a 75x speedup to the regression instrument).
      val scratch = s"$outDir/__timing_pass2"
      qs.filter(q => heavySet(q._1)).foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$scratch/$name")
          secondPass(name) = (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          System.err.println(s"[verify] $name second pass failed " +
            s"(timing kept from pass 1): ${e.getMessage}")
        }
      }
      try org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(scratch))
      catch { case _: Throwable => () }
      canaries :+= Canaries.sample()
    }
    def r3(v: Double): String =
      BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    // Published timings cover SUCCESSFUL pass-1 runs only: a failed query
    // has no dump (the correctness gate flags it) and its error-path
    // duration is not an engine time. Failures are still named in the
    // artifact so a shorter `queries` map is attributable.
    val okTimed = timed.filter(_._4)
    val failed = timed.filterNot(_._4).map(_._1)
    val secsJson = okTimed.map { case (n, s, _, _) =>
      s""""$n":${r3(secondPass.get(n).fold(s)(math.min(s, _)))}""" }
      .mkString("{", ",", "}")
    val heavyJson = secondPass.map { case (n, s2) =>
      val s1 = okTimed.find(_._1 == n).map(_._2).getOrElse(s2)
      s""""$n":[${r3(s1)},${r3(s2)}]""" }.mkString("{", ",", "}")
    val winJson = okTimed.map { case (n, _, w, _) =>
      val a = canaries(w)
      val b = canaries(math.min(w + 1, canaries.size - 1))
      s""""$n":[${r3(math.max(a.single, b.single))},${r3(math.max(a.par32, b.par32))},${r3(math.max(a.mem, b.mem))}]"""
    }.mkString("{", ",", "}")
    val canJson = canaries.map(c =>
      s"[${r3(c.single)},${r3(c.par32)},${r3(c.mem)}]").mkString("[", ",", "]")
    val minTotal = okTimed.map { case (n, s, _, _) =>
      secondPass.get(n).fold(s)(math.min(s, _)) }.sum
    val failedJson = failed.map(n => s""""$n"""").mkString("[", ",", "]")
    def names(xs: Iterable[String]): String =
      xs.toSeq.sorted.map(n => s""""$n"""").mkString("[", ",", "]")
    // one-time artifact builds priced as their own lines (never part of
    // any query's published min — contaminated queries were re-timed)
    val buildsJson = graft.ops.ArtifactBuilds.snapshot.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":${r3(v)}""" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/spark_secs.json"),
      s"""{"metric":"verify_spark_secs","unit":"sec","sf":"$sfDir","agg":"min_of_2_heavy_top20_canary_build_fixed","total":${r3(minTotal)},"first_pass_total":${r3(okTimed.map(_._2).sum)},"n_queries":${okTimed.size},"n_failed":${failed.size},"failed":$failedJson,"queries":$secsJson,"heavy_passes":$heavyJson,"artifact_builds":$buildsJson,"retime_build":${names(buildContaminated)},"retime_canary":${names(canaryFlagged)},"retime_fixed_input":${names(fixedInput.intersect(okTimed.map(_._1).toSet))},"window_canaries":$winJson,"raw_canaries":$canJson,"canary_min":[${r3(canaries.map(_.single).min)},${r3(canaries.map(_.par32).min)},${r3(canaries.map(_.mem).min)}]}""")
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
