package graft

import java.util.concurrent.atomic.AtomicBoolean

import org.scalatest.Retries
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.tagobjects.Retryable

/** The bench's machine-health stamp must actually detect the failure
  * mode it exists for: a box that was idle at start and degraded
  * mid-run (VERDICT r11 #1 — two consecutive driver records passed the
  * start-load gate and still ran ~2x clean numbers). This spec degrades
  * the machine FOR REAL — 2x-cores busy-spin threads — and asserts the
  * calibration score moves past the contamination gate, then releases
  * the load and asserts the score recovers below it.
  */
class MachineHealthSpec extends AnyFunSuite with Retries {

  // small work unit: the spec needs relative movement, not the bench's
  // absolute stability, and 3 calibrations must not dominate suite time
  private val iters = 20000000L

  // wall-clock-sensitive: one transient scheduler/GC hiccup inside the
  // 16-minute full suite can fail a leg that passes in isolation — the
  // test retries once before reporting failure (observed flaking exactly
  // once in an otherwise-green full-suite run)
  override def withFixture(test: NoArgTest) =
    if (isRetryable(test)) withRetry { super.withFixture(test) }
    else super.withFixture(test)

  test("calibration gate fires under synthetic CPU load and clears after",
      Retryable) {
    // Wall-clock-sensitive: on an already-contended box the "idle"
    // baseline is inflated and the recovery assertion below can fail
    // for reasons unrelated to the code. Skip (don't fail) unless a
    // quick pre-check says the box is actually quiet: two back-to-back
    // calibrations must agree within the gate's own margin.
    val pre1 = MachineHealth.score(iters)
    val pre2 = MachineHealth.score(iters)
    assume(math.max(pre1, pre2) / math.min(pre1, pre2) < MachineHealth.ratioGate,
      f"box not idle (back-to-back calibrations $pre1%.1f / $pre2%.1f ms " +
        "disagree past the gate); skipping wall-clock-sensitive spec")

    val idle = math.min(pre1, pre2)
    assert(idle > 0.0)

    val stop = new AtomicBoolean(false)
    val hogs = (1 to Runtime.getRuntime.availableProcessors() * 2).map { i =>
      val t = new Thread(() => {
        var x = i.toLong
        while (!stop.get()) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17 }
        MachineHealth.sink ^= x
      }, s"health-hog-$i")
      t.setDaemon(true)
      t.start()
      t
    }
    val loaded =
      try MachineHealth.score(iters)
      finally { stop.set(true); hogs.foreach(_.join(2000)) }

    assert(MachineHealth.degraded(idle, loaded),
      f"score did not degrade past the gate under 2x-cores load: " +
        f"idle $idle%.1f ms, loaded $loaded%.1f ms " +
        f"(ratio ${loaded / idle}%.2f, gate ${MachineHealth.ratioGate})")

    // and the signal is not sticky: an idle re-measure clears the gate
    val after = MachineHealth.score(iters)
    assert(!MachineHealth.degraded(idle, after),
      f"score did not recover once the load stopped: " +
        f"idle $idle%.1f ms, after $after%.1f ms")
  }

  test("I/O probe runs, cleans up its temp file, and returns a finite score") {
    val dir = java.nio.file.Files.createTempDirectory("graft-iocal-spec")
    try {
      val ms = MachineHealth.ioScore(mb = 8, dir = dir.toString, reps = 1)
      assert(ms > 0.0 && ms < 60000.0, f"implausible io score $ms%.1f ms")
      assert(!java.nio.file.Files.list(dir).iterator().hasNext,
        "probe left its temp file behind")
    } finally {
      java.nio.file.Files.list(dir).forEach(p => java.nio.file.Files.delete(p))
      java.nio.file.Files.delete(dir)
    }
  }
}
