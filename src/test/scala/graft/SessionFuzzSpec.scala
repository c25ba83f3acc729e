package graft.tools

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession
import graft.tools.SessionFuzz.{Sess, SessionModel}

/** Pins the model-based oracle for out-of-order SESSION windows (VERDICT
  * r17 #1). The model encodes three measured Spark semantics — merge-on-
  * TOUCH, the one-batch late-filter lag (two-watermark split), and
  * double-emission when a late row re-opens an evicted session — each
  * pinned here on a hand-built deterministic schedule, plus a small
  * end-to-end leg comparing the model against REAL session_window
  * streaming queries (the 150+ sweep is the committed SESSIONFUZZ
  * artifact's job; this keeps the model from drifting between soaks).
  */
class SessionFuzzSpec extends AnyFunSuite {

  // ---- pure model pins ----------------------------------------------------

  private def ev(key: String, ts: Long): (String, Long, Long) = (key, ts, 1L)

  test("merge-on-touch: an event at exactly last-ts + gap JOINS the session") {
    // family E's strict rule: diff > gap starts a new session, diff == gap merges
    val (out, _) = SessionModel.run(
      Seq(Seq(ev("a", 1000L), ev("a", 1100L), ev("a", 1200L), ev("a", 1301L))),
      gapMs = 100L, delayMs = 0L)
    val sessions = out.map { case (k, s) => (k, s.start, s.end) }
    assert(sessions == Seq(("a", 1000L, 1300L), ("a", 1301L, 1401L)),
      s"touch chain must merge 1000..1200 and split strictly past the gap: $sessions")
  }

  test("one-batch late-filter lag: a row one batch behind the eviction wave lands, two behind drops") {
    // wm after batch 0 = 1000; after batch 1 = 5000. Batch 2's row at
    // ts=1500 is late vs the CURRENT watermark (1500+10 <= 5000) but the
    // late filter uses the previous batch's (1000): it survives and emits
    // as its own session. The same row under the no-lag mutation drops.
    val slices = Seq(
      Seq(ev("a", 1000L)),
      Seq(ev("a", 5000L)),
      Seq(ev("a", 1500L)))
    val (lag, _) = SessionModel.run(slices, gapMs = 10L, delayMs = 0L)
    assert(lag.map(_._2.start).sorted == Seq(1000L, 1500L, 5000L),
      s"lag model must keep the one-batch-late row: $lag")
    val (nolag, st) = SessionModel.run(slices, gapMs = 10L, delayMs = 0L,
      lateLagBatches = 0)
    assert(nolag.map(_._2.start).sorted == Seq(1000L, 5000L),
      s"no-lag mutation must drop it: $nolag")
    assert(st.lateDropped == 1)
  }

  test("double-emission: a late row re-opens an evicted session and overlaps its emission") {
    // key a's session [1000,1100) evicts at batch 2 (wm 1100, end <= wm);
    // batch 3's a-row at ts=1050 passes the LAGGED late filter
    // (1050+100 > lateWm 1100 is false... 1150 > 1100 true) and, with its
    // session gone from state, starts a fresh [1050,1150) — two emitted
    // a-sessions that OVERLAP, the semantics a batch SQL oracle cannot
    // express (why this family needs a model oracle at all)
    val slices = Seq(
      Seq(ev("a", 1000L)),
      Seq(ev("b", 1100L)),
      Seq(ev("b", 3000L)),
      Seq(ev("a", 1050L)))
    val (out, _) = SessionModel.run(slices, gapMs = 100L, delayMs = 0L)
    val aSessions = out.filter(_._1 == "a").map(_._2)
    assert(aSessions.map(s => (s.start, s.end)).sorted ==
      Seq((1000L, 1100L), (1050L, 1150L)), s"expected re-open: $out")
    assert(SessionModel.hasDoubleEmission(out))
    // the in-order replay of the same rows has no double emission
    val inOrder = slices.flatten.sortBy(_._2)
    val (ordered, _) = SessionModel.run(Seq(inOrder), 100L, 0L)
    assert(!SessionModel.hasDoubleEmission(ordered))
  }

  test("eviction merges FIRST: a batch row extends a session the same batch would evict") {
    // wm entering batch 1 is 1000 (from batch 0's ts=1100... minus nothing
    // — delay 100 gives wm 1000); session [900,1000) has end <= wm and
    // would evict, but batch 1's row at ts=950 touches it first and the
    // merged [900,1050) survives — Spark's save-exec order (restore/merge,
    // then evict)
    val slices = Seq(
      Seq(ev("a", 900L), ev("b", 1100L)),
      Seq(ev("a", 950L)))
    val (out, _) = SessionModel.run(slices, gapMs = 100L, delayMs = 100L)
    val a = out.filter(_._1 == "a").map(_._2)
    assert(a.map(s => (s.start, s.end)) == Seq((900L, 1050L)),
      s"merge must beat eviction: $out")
  }

  test("empty slices advance nothing and break nothing") {
    val (out, _) = SessionModel.run(
      Seq(Seq(ev("a", 1000L)), Seq.empty, Seq(ev("a", 1500L))), 100L, 0L)
    assert(out.nonEmpty)
  }

  // ---- end-to-end: model vs a REAL session_window stream -------------------

  lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // isolated view catalog (shared-JVM suite; see SqlFuzzSpec)
    s.newSession()
  }

  test("model matches the engine on real out-of-order session streams") {
    val sfDir = "/root/testdata/sf0.001"
    GraftSession.prepare(spark, sfDir)
    val (pools, evT, _) = StreamFuzz.eventPools(spark)
    val counts = scala.collection.mutable.Map(
      "rows" -> 0, "sessions" -> 0, "late_dropped" -> 0, "mid_emissions" -> 0,
      "shapes_with_late_drops" -> 0, "shapes_with_mid_evictions" -> 0,
      "shapes_with_double_emission" -> 0)
    (0 until 4).foreach { i =>
      SessionFuzz.runShape(spark, i, 61000L, pools, evT, counts) match {
        case Some(detail) => fail(s"shape $i (seed ${61000L + i}): $detail")
        case None => ()
      }
    }
    // the shapes must be exercising the OOO mechanics, not replaying in order
    assert(counts("shapes_with_late_drops") > 0)
    assert(counts("shapes_with_mid_evictions") > 0)
  }
}
