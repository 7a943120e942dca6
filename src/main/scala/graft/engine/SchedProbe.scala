package graft.engine

/** Fixed-work scheduler-contention probe for bench drift attribution.
  *
  * The box this engine benches on has produced three distinct host-drift
  * signatures across rounds 6-7 (SCALE.md, BENCH_local_r7_final2.json):
  * storage-side waves (caught by the io canary), memory/compute pressure
  * (caught by the value_counts canary), and scheduler-side contention
  * (both existing canaries flat, wall-clock uniformly inflated, dmesg
  * hrtimer warnings) — the last one was only inferrable from run totals,
  * never provable from the artifact alone. This probe closes that gap.
  *
  * It busy-spins a fixed amount of pure userland integer arithmetic
  * (xorshift64*, zero I/O, zero allocation, zero Spark) on the calling
  * thread and reads `/proc/thread-self/schedstat` field 2 (nanoseconds the
  * thread spent runnable-but-not-running) around the spin. The pairing
  * makes the drift cause readable directly from the emitted series:
  *
  *  - spin wall flat                         → scheduler + cpu clock healthy
  *  - spin wall inflated, sched-delay risen  → runqueue contention (the box
  *    is oversubscribed; wall numbers for everything are untrustworthy)
  *  - spin wall inflated, sched-delay flat   → cpu frequency / thermal
  *    throttle (the thread ran the whole time but the clock was slower)
  *
  * The work size is fixed (not time-calibrated) so every sample across a
  * run — and across runs of the same binary — measures the same job; the
  * first call per JVM should be discarded or run untimed (JIT warmup).
  */
object SchedProbe {

  /** Fixed spin length: ~50-80 ms of xorshift64* on one idle 2-3 GHz core
    * once JIT-compiled. Long enough to span several scheduler ticks (so
    * run-delay can actually accumulate), short enough to sample every
    * canary point for free.
    */
  val SpinIters: Long = 60000000L

  private def schedDelayNanos(): Long =
    try {
      val raw = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/thread-self/schedstat")))
      raw.trim.split("\\s+")(1).toLong
    } catch { case _: Throwable => -1L }

  /** One probe sample on the calling thread.
    * @return (wallSec, schedDelaySec): wall-clock of the fixed spin, and the
    *         runnable-but-not-running delta over it (-1.0 when
    *         /proc/thread-self/schedstat is unreadable).
    */
  def sample(): (Double, Double) = {
    val d0 = schedDelayNanos()
    val t0 = System.nanoTime()
    var x = 0x9E3779B97F4A7C15L
    var i = 0L
    while (i < SpinIters) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      i += 1
    }
    val wall = (System.nanoTime() - t0) / 1e9
    val d1 = schedDelayNanos()
    // sink the spin result so the loop cannot be dead-code eliminated
    if (x == 42L) System.err.print("")
    val delay = if (d0 >= 0 && d1 >= 0) (d1 - d0) / 1e9 else -1.0
    (wall, delay)
  }

  /** Untimed JIT warmup; call once per JVM before the first recorded sample. */
  def warmup(): Unit = { sample(); () }

  /** Formats n samples for a failure-message annotation (PerfBudgetSpec):
    * lets a budget breach carry its own code-vs-box verdict inline.
    */
  def describe(n: Int = 3): String = {
    val samples = (0 until n).map(_ => sample())
    // Locale.ROOT: the default locale may render decimals with ','
    def f3(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val walls = samples.map { case (w, _) => f3(w) }.mkString(",")
    val delays = samples.map { case (_, d) => f3(d) }.mkString(",")
    s"sched-probe wall=[$walls]s run-delay=[$delays]s (fixed ${SpinIters} iters; " +
      "inflated wall + risen delay = box scheduler contention, " +
      "inflated wall + flat delay = cpu throttle, flat wall = code)"
  }
}
