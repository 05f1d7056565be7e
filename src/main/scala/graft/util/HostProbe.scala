package graft.util

import java.util.concurrent.atomic.AtomicBoolean

/**
 * Host-ceiling micro-probes for the scaling study: how fast can this
 * machine run purely STREAMING work and purely COMPUTE work at a given
 * thread count, right now? Run inside each fresh scaling-child JVM (clean
 * heap — probing from the parent after a full bench suite once measured
 * hi-threads SLOWER than lo-threads purely from GC interference).
 *
 * The lo-vs-hi ratios of these two numbers bracket what ANY data-parallel
 * job can measure on a single shared-bus VM: a job whose cycles are byte
 * traffic cannot beat the dram ratio, one whose cycles are FLOPs cannot
 * beat the flops ratio. Real cluster executors have a memory bus per
 * machine, which is why the study interprets its efficiency against these
 * per-window ceilings (BASELINE.md).
 */
object HostProbe {

  private def sweep(threads: Int, seconds: Double)(work: Int => Long): Double = {
    val stop = new AtomicBoolean(false)
    val counts = new Array[Long](threads)
    val ts = (0 until threads).map { i =>
      val t = new Thread(() => {
        var c = 0L
        while (!stop.get()) c += work(i)
        counts(i) = c
      })
      t.setDaemon(true); t.start(); t
    }
    Thread.sleep((seconds * 1000).toLong); stop.set(true); ts.foreach(_.join())
    counts.sum / seconds
  }

  /** Streaming probe: per-thread 64 MB stride-64B array walks; returns
   * completed sweeps/sec across all threads (bounded by DRAM bandwidth). */
  def memSweep(threads: Int, seconds: Double = 2.0): Double = {
    val arrs = Array.fill(threads)(new Array[Long](8 * 1024 * 1024)) // 64 MB
    val sink = new java.util.concurrent.atomic.AtomicLong()
    val r = sweep(threads, seconds) { i =>
      val arr = arrs(i)
      var s = 0L; var j = 0
      while (j < arr.length) { s += arr(j); j += 8 }
      sink.lazySet(s); 1L
    }
    r
  }

  /** Compute probe: per-thread fused multiply-add loops on locals (no
   * memory traffic); returns completed 1M-FMA blocks/sec across threads. */
  def computeSweep(threads: Int, seconds: Double = 2.0): Double = {
    val sink = new java.util.concurrent.atomic.AtomicLong()
    sweep(threads, seconds) { i =>
      var x = 1.0 + i; var y = 0.5; var j = 0
      while (j < 1000000) { x = x * 1.0000001 + y; y = y * 0.9999999 + 1e-9; j += 1 }
      sink.lazySet(java.lang.Double.doubleToLongBits(x)); 1L
    }
  }
}
