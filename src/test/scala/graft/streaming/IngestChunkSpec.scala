package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.SlidingWindows.{AggSpec, KeyState, RangeMs, ingestChunk, needsOf}

/** Unit pins for the merge-based buffer ingest (the quadratic-insertion
  * fix): global (ts, seq) order after arbitrary chunking, arrival-order
  * tie-breaks, and tile counts that match the buffer.
  */
class IngestChunkSpec extends AnyFunSuite {

  private val needs = needsOf(Seq(AggSpec("s", "sum", RangeMs(1000))), 1, 0)
  private def row(ts: Long, v: Double) = (ts, Array(v), Array.empty[String])

  test("buffer stays (ts, seq)-sorted under out-of-order chunked ingest") {
    val st = new KeyState
    val rnd = new scala.util.Random(3)
    val all = rnd.shuffle((0 until 5000).map(i => row(rnd.nextInt(500).toLong, i.toDouble)))
    all.grouped(700).foreach(chunk => ingestChunk(st, chunk.iterator, Seq(100L), needs))
    assert(st.buffer.length == 5000)
    st.buffer.sliding(2).foreach { case scala.collection.mutable.ArrayBuffer(a, b) =>
      assert(a._1 < b._1 || (a._1 == b._1 && a._2 < b._2),
        s"order violated: ${(a._1, a._2)} then ${(b._1, b._2)}")
    }
    // tiles saw every row exactly once
    assert(st.tiles(100L).values.map(_.count).sum == 5000L)
  }

  test("ts ties keep arrival order via seq") {
    val st = new KeyState
    ingestChunk(st, Iterator(row(7, 1.0), row(7, 2.0), row(3, 0.0)), Seq(100L), needs)
    ingestChunk(st, Iterator(row(7, 3.0)), Seq(100L), needs)
    val atTs7 = st.buffer.filter(_._1 == 7L).map(r => (r._2, r._3(0)))
    assert(atTs7.map(_._2) == Seq(1.0, 2.0, 3.0), "same-ts rows must keep arrival order")
    assert(atTs7.map(_._1) == atTs7.map(_._1).sorted, "seqs ascend within a ts")
    assert(st.buffer.head._1 == 3L)
  }

  test("in-order chunks take the append fast path and stay correct") {
    val st = new KeyState
    (0 until 10).foreach { c =>
      ingestChunk(st, (0 until 100).map(i => row(c * 100L + i, i.toDouble)).iterator,
        Seq(100L), needs)
    }
    assert(st.buffer.length == 1000)
    assert(st.buffer.map(_._1) == st.buffer.map(_._1).sorted)
  }

  test("coarse tile hierarchy: identical results, far fewer folds per long-frame eval") {
    // 30-minute frame over 1 s rows with 2 s fine tiles: single-granularity
    // interiors fold ~900 tiles per emission, a 2s/10s/60s hierarchy ~30.
    val spec = AggSpec("s30m", "sum", RangeMs(1800000))
    val n = needsOf(Seq(spec), 1, 0)
    def build(grans: Seq[Long]): KeyState = {
      val st = new KeyState
      ingestChunk(st,
        (0 until 2400).map(i => row(1704067200000L + 1000L * i, (i % 13).toDouble)).iterator,
        grans, n)
      st
    }
    val fine = build(Seq(2000L))
    val multi = build(Seq(2000L, 10000L, 60000L))
    val last = fine.buffer.length - 1
    val fineVal = SlidingWindows.evalSpec(fine, spec, last, Seq(2000L), n)
    val multiVal = SlidingWindows.evalSpec(multi, spec, last, Seq(2000L, 10000L, 60000L), n)
    assert(fineVal == multiVal, "hierarchy must not change the result")
    assert(multi.tileFolds * 10 < fine.tileFolds,
      s"coarse walk should cut folds >10x: fine=${fine.tileFolds} multi=${multi.tileFolds}")
  }
}
