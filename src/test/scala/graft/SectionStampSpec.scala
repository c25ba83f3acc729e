package graft

import java.util.concurrent.atomic.AtomicBoolean

import org.scalatest.Retries
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.tagobjects.Retryable

/** Per-section contamination stamps (VERDICT r15 #3).
  *
  * The failure being pinned: the r15 driver bench record passed the
  * GLOBAL contamination gate (worst I/O ratio 1.63 < the 2.5 io gate,
  * CPU ~1.0) while its trigger-cadence-bound streaming entries ran
  * 1.8-2.8x their clean times — a contended record with no way to tell
  * WHICH numbers to distrust. The fix is two-fold and both halves are
  * pinned here: (a) section-level stamps from the calibration
  * checkpoints bounding each phase, and (b) per-entry suspect labels
  * for catalog entries 1.8-3x their committed reference (above 3x the
  * outlier-retry machinery already fires).
  */
class SectionStampSpec extends AnyFunSuite with Retries {

  // same retry-once policy as MachineHealthSpec: the real-load leg is
  // wall-clock-sensitive and a transient hiccup mid-suite must not red
  // an otherwise-green run
  override def withFixture(test: NoArgTest) =
    if (isRetryable(test)) withRetry { super.withFixture(test) }
    else super.withFixture(test)

  private val bounds = Seq(
    ("catalog", "start", "after_catalog"),
    ("streaming", "after_catalog", "after_streaming"),
    ("request", "before_request", "after_request"))

  test("clean run: every section unstamped, ratios near 1") {
    val calib = Map("start" -> 100.0, "after_catalog" -> 103.0,
      "after_streaming" -> 99.0, "before_request" -> 101.0,
      "after_request" -> 102.0)
    val io = calib.map { case (k, v) => k -> v * 3 }
    val st = Bench.sectionStamps(calib, io, bounds)
    assert(st.size == 3)
    assert(st.forall(!_._4), s"clean run stamped: $st")
    assert(st.forall(s => s._2 < 1.1 && s._3 < 1.1))
  }

  test("mid-run CPU contention stamps ONLY the sections it bounds") {
    // box degrades during streaming (after_streaming checkpoint 2x) and
    // recovers before the request phase — catalog and request sections
    // must stay clean, streaming must stamp
    val calib = Map("start" -> 100.0, "after_catalog" -> 101.0,
      "after_streaming" -> 200.0, "before_request" -> 104.0,
      "after_request" -> 103.0)
    val io = calib.map { case (k, v) => k -> 300.0 } // io flat
    val st = Bench.sectionStamps(calib, io, bounds).map(s => s._1 -> s._4).toMap
    assert(!st("catalog") && st("streaming") && !st("request"), st.toString)
  }

  test("I/O contention stamps through its own gate, independent of CPU") {
    // the r12 failure shape: CPU ratio ~1.01, disk 3x — the io gate
    // (2.5) must fire alone
    val calib = Map("start" -> 100.0, "after_catalog" -> 101.0)
    val io = Map("start" -> 300.0, "after_catalog" -> 920.0)
    val st = Bench.sectionStamps(calib, io, Seq(("catalog", "start", "after_catalog")))
    assert(st.head._4, s"io-degraded section not stamped: $st")
    assert(st.head._2 < 1.1 && st.head._3 > 3.0)
  }

  test("r15 contended-record replay: global gate passes, suspects fire") {
    // the actual shape that motivated this: worst io ratio 1.63 is UNDER
    // the 2.5 io gate (global record read contaminated:false) yet the
    // streaming catalog entries ran 1.8-2.8x their committed clean times
    val calib = Map("start" -> 100.0, "after_catalog" -> 102.0)
    val io = Map("start" -> 300.0, "after_catalog" -> 489.0) // ratio 1.63
    val st = Bench.sectionStamps(calib, io, Seq(("catalog", "start", "after_catalog")))
    assert(!st.head._4, "1.63 io ratio must not trip the 2.5 io gate")
    // ...so the per-ENTRY labels are what catch it
    val ref = Map("q_late_drop" -> 3.97, "q_window_streaming_tws" -> 2.4,
      "q1_agg" -> 0.8, "q_dedup_minhash" -> 3.0)
    val run = Seq("q_late_drop" -> 9.3, // 2.3x clean (the r15 number)
      "q_window_streaming_tws" -> 6.7, // 2.8x clean
      "q1_agg" -> 0.9, "q_dedup_minhash" -> 3.4)
    val sus = Bench.suspectEntries(run, ref).toMap
    assert(sus.keySet == Set("q_late_drop", "q_window_streaming_tws"), sus.toString)
    assert(sus("q_late_drop") > 2.2 && sus("q_late_drop") < 2.4)
  }

  test("suspect labels: below-ratio, sub-second, failed and missing-ref entries stay quiet") {
    val ref = Map("a" -> 2.0, "b" -> 0.1, "c" -> 5.0, "failed" -> -1.0)
    val run = Seq(
      "a" -> 3.5, // 1.75x < 1.8 gate
      "b" -> 0.9, // 9x but only +0.8 s — sub-second noise band
      "c" -> -1.0, // failed this run
      "failed" -> 4.0, // failed in the REFERENCE record
      "new_entry" -> 60.0) // no reference at all
    assert(Bench.suspectEntries(run, ref).isEmpty)
  }

  test("workload-filtered runs omit unboundable sections, never guess") {
    val calib = Map("start" -> 100.0, "after_catalog" -> 101.0)
    val io = calib
    val st = Bench.sectionStamps(calib, io, bounds)
    assert(st.map(_._1) == Seq("catalog"))
  }

  // ---- compact headline (VERDICT r16 #1) -------------------------------

  private val fullCatalog: Seq[(String, Double)] =
    (1 to 156).map(i => f"q_entry_with_a_realistic_name_$i%03d" -> (0.1 + i * 0.05))
  private val fiveSections = Seq(
    ("catalog", 1.0, 1.2, false), ("streaming", 1.01, 1.1, false),
    ("wordcount", 0.99, 1.0, false), ("request", 1.02, 1.54, false),
    ("tail", 0.96, 1.12, false))
  private val twelveSuspects =
    (1 to 12).map(i => f"q_suspect_entry_name_$i%02d" -> (1.8 + i * 0.3))

  test("headline fits the driver's 2000-char stdout tail at full catalog size") {
    // <= 1800 leaves margin for the runner's [info] prefix and the
    // trailing sbt success line inside the same 2000-char tail
    val h = Bench.headline(133.2, "/root/testdata/sf0.1", 156, 0, false,
      fiveSections, twelveSuspects, fullCatalog, "/tmp/BENCH_local.json")
    assert(h.length <= 1800, s"headline ${h.length} chars blows the tail window")
    assert(!h.contains("\n"))
  }

  test("headline is valid JSON carrying totals, stamps, suspects, heaviest entries") {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val h = Bench.headline(133.2, "/root/testdata/sf0.1", 156, 2, true,
      fiveSections, twelveSuspects, fullCatalog, "/root/repo/BENCH_local.json")
    val j = JsonMethods.parse(h) // throws on malformed JSON
    assert((j \ "metric") == JString("total"))
    assert((j \ "n_entries") == JInt(156) && (j \ "n_failed") == JInt(2))
    assert((j \ "contaminated") == JBool(true))
    assert((j \ "suspects_total") == JInt(12))
    val secs = (j \ "sections").asInstanceOf[JObject].obj.map(_._1)
    assert(secs == List("catalog", "streaming", "wordcount", "request", "tail"))
    // the heaviest catalog entry must be the FIRST thing trimmed-for, so
    // whatever subset fits always includes it
    val top = (j \ "queries_top").asInstanceOf[JObject].obj.map(_._1)
    assert(top.head == "q_entry_with_a_realistic_name_156")
    assert(top.nonEmpty && top.size < 156) // genuinely trimmed
  }

  test("headline survives pathological inputs (no sections, empty run, quotes in sf)") {
    import org.json4s.jackson.JsonMethods
    val h = Bench.headline(0.0, "/tmp/weird\"dir", 0, 0, false,
      Nil, Nil, Nil, "/tmp/out.json")
    JsonMethods.parse(h)
    assert(h.length < 400)
  }

  test("stamp fires end-to-end from a REAL synthetic load on one boundary",
      Retryable) {
    // same preconditions as MachineHealthSpec: skip on a box that is
    // already contended (the idle baseline would be inflated)
    val iters = 20000000L
    val pre1 = MachineHealth.score(iters)
    val pre2 = MachineHealth.score(iters)
    assume(math.max(pre1, pre2) / math.min(pre1, pre2) < MachineHealth.ratioGate,
      "box not idle; skipping wall-clock-sensitive leg")
    val idle = math.min(pre1, pre2)

    val stop = new AtomicBoolean(false)
    val hogs = (1 to Runtime.getRuntime.availableProcessors() * 2).map { i =>
      val t = new Thread(() => {
        var x = i.toLong
        while (!stop.get()) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17 }
        MachineHealth.sink ^= x
      }, s"stamp-hog-$i")
      t.setDaemon(true); t.start(); t
    }
    val loaded =
      try MachineHealth.score(iters)
      finally { stop.set(true); hogs.foreach(_.join(2000)) }

    // feed the real scores into the section composition: the section the
    // loaded checkpoint bounds stamps; the neighbor sections do not
    val calib = Map("start" -> idle, "after_catalog" -> idle,
      "after_streaming" -> loaded, "before_request" -> idle,
      "after_request" -> idle)
    val io = Map("start" -> 1.0, "after_catalog" -> 1.0,
      "after_streaming" -> 1.0, "before_request" -> 1.0,
      "after_request" -> 1.0)
    val st = Bench.sectionStamps(calib, io, bounds).map(s => s._1 -> s._4).toMap
    assert(st("streaming"),
      f"real-load boundary did not stamp (idle $idle%.1f, loaded $loaded%.1f)")
    assert(!st("catalog") && !st("request"))
  }
}
