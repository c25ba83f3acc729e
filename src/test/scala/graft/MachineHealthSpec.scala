package graft

import java.util.concurrent.atomic.AtomicBoolean

import org.scalatest.funsuite.AnyFunSuite

/** The bench's machine-health stamp must actually detect the failure
  * mode it exists for: a box that was idle at start and degraded
  * mid-run (VERDICT r11 #1 — two consecutive driver records passed the
  * start-load gate and still ran ~2x clean numbers). This spec degrades
  * the machine FOR REAL — 2x-cores busy-spin threads — and asserts the
  * calibration score moves past the contamination gate, then releases
  * the load and asserts the score recovers below it.
  */
class MachineHealthSpec extends AnyFunSuite {

  // small work unit: the spec needs relative movement, not the bench's
  // absolute stability, and 3 calibrations must not dominate suite time
  private val iters = 20000000L

  test("calibration gate fires under synthetic CPU load and clears after") {
    val idle = MachineHealth.score(iters)
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
}
