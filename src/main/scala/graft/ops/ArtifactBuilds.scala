package graft.ops

/** Wall-clock registry for the one-time per-(JVM, dataset) artifact
  * builds (graph edge tables, mm payload corpora, dedup edge sets).
  *
  * Why it exists (r14 verdict item 5): a one-time build lands inside
  * whichever registered consumer touches the latch first BY SWEEP ORDER,
  * so per-query timings were order-dependent — graph_adamic_adar's
  * isolated min-of-2 carried the symmetric-edge build that the in-sweep
  * run had already absorbed elsewhere. Every latch body is wrapped in
  * [[timed]], which (a) records the build's own seconds under a stable
  * name for the timing artifact to publish as its own line, and (b) lets
  * Verify detect that a query's pass-1 was build-contaminated (the
  * [[count]] moved while it ran) and force that query into the second
  * timed pass, so the published min is always POST-build regardless of
  * sweep order or isolation.
  *
  * At 100 TB these builds are ingest-pipeline jobs, not query costs —
  * pricing them separately is the honest ledger, and results never
  * depend on them (oracles rebuild everything inline).
  */
object ArtifactBuilds {
  private val builds =
    new java.util.concurrent.ConcurrentHashMap[String, Double]()

  /** Runs `body` (an artifact latch body) and records its wall seconds
    * under `artifact|datasetDir`. Returns `body`'s result. NOTE: a build
    * that triggers a NESTED first-build (verified edges building the
    * candidate artifact) records the nested seconds in BOTH entries —
    * the snapshot prices each artifact's first-touch wall, so summing
    * entries can double-count; read them as individual lines.
    */
  private[graft] def timed[T](artifact: String, d: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    builds.put(s"$artifact|$d", (System.nanoTime() - t0) / 1e9)
    r
  }

  /** Monotone count of builds recorded so far — cheap contamination
    * probe: sample before/after timing a query; a delta means the query
    * paid a first-time build.
    */
  def count: Int = builds.size

  /** All recorded builds: `artifact|datasetDir` → seconds. */
  def snapshot: Map[String, Double] = {
    import scala.jdk.CollectionConverters._
    builds.asScala.toMap
  }
}
