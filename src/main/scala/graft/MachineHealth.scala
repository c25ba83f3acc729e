package graft

/** Pure-JVM machine-health calibration for the bench record.
  *
  * Why: the official r10 AND r11 driver records both passed the
  * start-load gate (box idle at t=0) yet ran ~2x the committed clean
  * numbers — the machine degraded MID-run (r11's record: load 1.94 at
  * start, 13.91 at end; the pure-JVM wordcount phase ran 2.7x slower
  * than r10 on identical code). A start-only gate structurally cannot
  * see that, and the 1-minute load average at the end is polluted by the
  * bench's own 32-thread phases — so the record needs a signal that is
  * (a) independent of Spark, (b) cheap enough to re-sample between
  * phases, and (c) comparable across checkpoints of one run.
  *
  * This is that signal: a fixed, single-threaded, allocation-free
  * xorshift work unit timed as min-of-3 after an untimed JIT warm-up.
  * On an idle box the score is stable to a few percent; under a noisy
  * neighbor the calibration thread loses timeslice proportionally. The
  * bench samples it at start, between phases, and at end; any checkpoint
  * beyond [[ratioGate]] times the start score stamps the record
  * `contaminated` — a noisy-neighbor record then self-identifies instead
  * of reading as a 2x code regression (VERDICT r11 "what's wrong" #1).
  */
object MachineHealth {

  /** Fixed work unit: xorshift64 stream folded into an accumulator.
    * No allocation, no memory traffic beyond two locals — the score
    * measures cpu timeslice, not cache or GC luck. */
  private def workUnit(iters: Long): Long = {
    var x = 0x9E3779B97F4A7C15L
    var acc = 0L
    var i = 0L
    while (i < iters) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      acc += java.lang.Long.rotateLeft(x, (i & 63).toInt)
      i += 1
    }
    acc
  }

  // published sink so the JIT cannot elide the work
  @volatile var sink: Long = 0L

  /** Elapsed milliseconds for the fixed work unit — min of `reps` timed
    * runs after one untimed warm-up run. Min-of-3 filters one-off GC or
    * scheduler hiccups while still reflecting sustained contention
    * (a busy neighbor slows all three runs alike). ~0.5 s total at the
    * default size on this class of box. */
  def score(iters: Long = 80000000L, reps: Int = 3): Double = {
    sink ^= workUnit(iters / 4) // JIT warm-up, untimed
    var best = Double.MaxValue
    var r = 0
    while (r < reps) {
      val t0 = System.nanoTime()
      sink ^= workUnit(iters)
      val ms = (System.nanoTime() - t0) / 1e6
      if (ms < best) best = ms
      r += 1
    }
    best
  }

  /** A checkpoint score beyond this multiple of the run's start score
    * marks the record contaminated. 1.5 clears idle-box jitter (a few
    * percent) by a wide margin while catching the observed failure mode
    * (2-3x mid-run degradation). */
  val ratioGate: Double = 1.5

  def degraded(startMs: Double, laterMs: Double): Boolean =
    laterMs > startMs * ratioGate
}
