package graft

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Host-health instrumentation shared by [[Bench]] and [[BenchOne]].
  *
  * Round-13 post-mortem: the ambient-CPU-cores measure (Δ system busy −
  * Δ own jiffies over wall) defends against CPU *competition* — another
  * process burning cores — but is BLIND to whole-guest slowdown
  * (hypervisor steal the guest kernel doesn't surface, cgroup CPU-quota
  * throttling, IO/memory pressure): both system-busy and own-jiffies
  * shrink together while wall inflates, so ambient reads ≈ 0 and the
  * artifact self-certifies a 1.7–7× inflated reading as clean. Three
  * orthogonal signals those classes cannot hide from:
  *
  *  1. CANARY WORK RATE — a single daemon thread runs a fixed
  *     pure-register xorshift loop for the DURATION of each measured
  *     query and reports iterations/sec. Calibrated at boot (quiet,
  *     solo); `canary_ratio` = calibrated rate / observed rate. A
  *     cgroup quota, stolen vCPU time, or a saturating neighbor all
  *     slow the canary's fixed work per wall second — a number the
  *     guest's own (possibly lying) jiffy accounting never touches.
  *     Costs at most 1/32 core during measurement, identical in every
  *     sitting, so pair comparisons stay apples-to-apples.
  *  2. PSI — Δ `/proc/pressure/cpu` "some total" (µs any runnable task
  *     waited for CPU) over the query's wall: `psi_stall` is the stall
  *     fraction. Quota throttling and runnable-queue contention show
  *     here even when /proc/stat accounting looks clean.
  *  3. SPARK TASK CLOCK — per-query sums of executorRunTime (task wall)
  *     and executorCpuTime (task CPU ns) from the stage-completed
  *     listener stream. Stamped into the artifact so a judged run and a
  *     quiet pair are comparable at the metric level: same cpu_sec with
  *     inflated task_sec/wall = external starvation; inflated cpu_sec =
  *     a real regression. (Drained via ListenerBridge before snapshots.)
  */
object BenchProbe {

  /** `/proc/pressure/cpu` "some … total=<µs>" cumulative stall counter;
    * -1 when PSI is unavailable (kernel without CONFIG_PSI). */
  def psiCpuTotalMicros(): Long =
    try {
      val line = scala.io.Source.fromFile("/proc/pressure/cpu").getLines()
        .find(_.startsWith("some")).getOrElse("")
      val i = line.indexOf("total=")
      if (i < 0) -1L else line.substring(i + 6).trim.toLong
    } catch { case _: Throwable => -1L }

  // ---- canary ----------------------------------------------------------

  /** One batch of pure-register work (2^16 xorshift64 steps) — no memory
    * traffic, no syscalls: its wall time moves ONLY with effective CPU
    * speed available to this thread. Returns the state so the loop can't
    * be optimized away. */
  private def spinBatch(seed: Long): Long = {
    var x = if (seed == 0L) 0x9E3779B97F4A7C15L else seed
    var i = 0
    while (i < 65536) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      i += 1
    }
    x
  }

  /** One canary = one thread + its OWN counter + its OWN stop flag.
    * Per-instance state (not object-level shared fields) so a prior
    * canary that outlived `stop()`'s bounded join can never resume into
    * a later measurement window and inflate its observed rate — an
    * orphan increments a counter nobody reads and exits on its own
    * (still-true) flag's next check. */
  private final class Canary {
    val iters = new AtomicLong(0L)
    @volatile var run = true
    private val thread = new Thread(() => {
      var s = System.nanoTime() | 1L
      while (run) {
        s = spinBatch(s)
        iters.incrementAndGet()
      }
      // publish the final state so JIT can't elide the work
      if (s == 42L) System.err.println("")
    }, "graft-bench-canary")
    thread.setDaemon(true)
    thread.setPriority(Thread.NORM_PRIORITY)
    thread.start()
    def stop(): Long = { run = false; thread.join(1000); iters.get() }
  }

  /** Calibrated solo batch rate (batches/sec), measured at boot on the
    * (load-gated) quiet host: max of 3 × 200 ms solo runs, after one
    * DISCARDED warm-up run so C2 has compiled spinBatch before any
    * sample — a JIT-cold calibration undershoots the steady-state rate,
    * biasing every later canary_ratio below 1 and desensitizing the
    * throttle threshold. */
  @volatile private var calibratedRate: Double = -1.0

  def calibrate(): Double = {
    def sample(): Double = {
      val c = new Canary
      val t0 = System.nanoTime()
      Thread.sleep(200)
      val n = c.stop()
      n.toDouble / ((System.nanoTime() - t0) / 1e9)
    }
    sample() // discarded JIT warm-up
    calibratedRate = (1 to 3).map(_ => sample()).max
    calibratedRate
  }

  /** Run `body` with the canary spinning and PSI bracketing. Returns
    * (bodyResult, wallSecs, canaryRatio, psiStall). canaryRatio is
    * calibrated-rate / observed-rate — 1.0 on a healthy host, 2.0 when
    * fixed work ran at half speed; -1 when uncalibrated. psiStall is the
    * fraction of wall some runnable task waited for CPU; -1 when PSI is
    * unavailable. */
  def observe[A](body: => A): (A, Double, Double, Double) = {
    val psi0 = psiCpuTotalMicros()
    val c = new Canary
    val t0 = System.nanoTime()
    val out =
      try body
      finally { c.run = false }
    val wall = (System.nanoTime() - t0) / 1e9
    val n = c.stop()
    val psi1 = psiCpuTotalMicros()
    val rate = if (wall > 0) n.toDouble / wall else -1.0
    val ratio =
      if (calibratedRate <= 0 || rate <= 0) -1.0 else calibratedRate / rate
    val psiStall =
      if (psi0 < 0 || psi1 < 0 || wall <= 0) -1.0
      else ((psi1 - psi0) / 1e6) / wall
    (out, wall, ratio, psiStall)
  }

  // ---- JIT / code-cache health ------------------------------------------

  /** Cumulative JIT compilation time (ms) — per-query deltas localize
    * "the JVM spent this query recompiling the world" sittings; -1 when
    * the bean is unavailable or doesn't support timing. */
  def jitCompileMillis(): Long =
    try {
      val b = java.lang.management.ManagementFactory.getCompilationMXBean
      if (b != null && b.isCompilationTimeMonitoringSupported)
        b.getTotalCompilationTime
      else -1L
    } catch { case _: Throwable => -1L }

  /** Worst CodeHeap pool occupancy (used/max, 0–1) under the segmented
    * code cache; -1 when no CodeHeap pools are exposed. The r14 sitting
    * stamped two compute-dense codegen'd kernels at 3–7× their quiet
    * CPU with every host signal clean — the fitting in-JVM class is
    * code-cache exhaustion de-optimizing exactly the hot generated
    * loops ('non-profiled nmethods' filling disables C2 while tiny
    * canary loops stay compiled). A marathon's artifact should carry
    * the occupancy so that class is adjudicable from the JSON alone. */
  def codeCacheUsedPct(): Double =
    try {
      import scala.jdk.CollectionConverters._
      // "CodeHeap '…'" pools under the segmented cache (≥ 240 MB);
      // ONE "CodeCache" pool when the reservation is small enough that
      // the JVM silently de-segments it (validated with the 36 MB
      // pressure run, where the CodeHeap-only match read -1)
      val pools = java.lang.management.ManagementFactory.getMemoryPoolMXBeans
        .asScala.filter(p => p.getName.startsWith("CodeHeap") ||
          p.getName.replace(" ", "").startsWith("CodeCache"))
      val pcts = pools.flatMap { p =>
        val u = p.getUsage
        if (u == null || u.getMax <= 0) None
        else Some(u.getUsed.toDouble / u.getMax)
      }
      if (pcts.isEmpty) -1.0 else pcts.max
    } catch { case _: Throwable => -1.0 }

  // ---- Spark task clock -------------------------------------------------

  /** Cumulative executorRunTime/executorCpuTime/jvmGcTime sums fed by
    * stage-completed events; snapshot deltas give per-query task_sec /
    * cpu_sec / gc_sec. Register once per session. */
  final class TaskClock extends SparkListener {
    val runMillis = new AtomicLong(0L)   // task wall, ms
    val cpuNanos = new AtomicLong(0L)    // task CPU, ns
    val gcMillis = new AtomicLong(0L)
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
      val m = e.stageInfo.taskMetrics
      if (m != null) {
        runMillis.addAndGet(m.executorRunTime)
        cpuNanos.addAndGet(m.executorCpuTime)
        gcMillis.addAndGet(m.jvmGCTime)
      }
    }
    def snapshot(): (Long, Long, Long) =
      (runMillis.get(), cpuNanos.get(), gcMillis.get())
  }
}
