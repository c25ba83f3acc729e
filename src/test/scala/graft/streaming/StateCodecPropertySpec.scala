package graft.streaming

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.SlidingWindows.{AggSpec, RangeMs, RowsN}

/** Property roundtrip for the flat state codec — the engine re-encodes
  * every touched key's whole state per trigger, so codec fidelity IS
  * state-store correctness: any field the encode drops or the decode
  * misreads silently corrupts every later frame. Random states built
  * through the real ingest path (random rows, random spec sets spanning
  * all payload families), then encode -> decode -> encode must be
  * byte-identical and the decoded buffer must equal the original.
  */
class StateCodecPropertySpec extends AnyFunSuite {

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val genSpecs: Gen[Seq[AggSpec]] = for {
    // one spec per payload family so the tiles carry every payload shape
    useCm <- Gen.oneOf(true, false)
    useCate <- Gen.oneOf(true, false)
    useMasked <- Gen.oneOf(true, false)
    useRatio <- Gen.oneOf(true, false)
    rangeLen <- Gen.chooseNum(1000L, 100000L)
    rowsN <- Gen.chooseNum(1, 20)
  } yield Seq(
    Some(AggSpec("s", "sum", RangeMs(rangeLen))),
    Some(AggSpec("r", "avg", RowsN(rowsN))),
    if (useCm) Some(AggSpec("t", "top", RangeMs(rangeLen), 3)) else None,
    if (useCm) Some(AggSpec("m", "median", RangeMs(rangeLen))) else None,
    if (useCate) Some(AggSpec("sc", "sum_cate", RangeMs(rangeLen), cIdx = 0)) else None,
    if (useMasked) Some(AggSpec("sw", "sum_where", RangeMs(rangeLen), wIdx = 1)) else None,
    if (useRatio) Some(AggSpec("rk", "top_n_key_ratio_cate", RangeMs(rangeLen),
      2, wIdx = 1)) else None).flatten

  private val genRows: Gen[List[(Long, Array[Double], Array[String])]] = for {
    n <- Gen.chooseNum(0, 60)
    rows <- Gen.listOfN(n, for {
      ts <- Gen.chooseNum(0L, 500000L)
      v <- Gen.chooseNum(-100, 100)
      w <- Gen.oneOf(0.0, 1.0)
      c <- Gen.oneOf("a", "bb", "", "ccc")
    } yield (ts, Array(v.toDouble, w), Array(c)))
  } yield rows

  test("encode -> decode -> encode is byte-identical over random states") {
    for (seed <- 1L to 40L) {
      val specs = sample(genSpecs, seed)
      val rows = sample(genRows, seed + 500)
      val grans = SlidingWindows.tileGrans(60000L, Seq(300000L))
      val needs = SlidingWindows.needsOf(specs, nNum = 2, nStr = 1)
      val st = new SlidingWindows.KeyState
      // two chunks through the REAL ingest (sort + merge + tile update)
      val (c1, c2) = rows.splitAt(rows.length / 2)
      SlidingWindows.ingestChunk(st, c1.iterator, grans, needs)
      SlidingWindows.ingestChunk(st, c2.iterator, grans, needs)
      // emitted marks move too — they must survive the roundtrip
      if (st.buffer.nonEmpty) {
        st.emittedTs = st.buffer.head._1
        st.emittedSeq = st.buffer.head._2
      }
      val enc1 = StateCodec.encodeKeyState(st)
      val dec = StateCodec.decodeKeyState(enc1, grans, needs)
      val enc2 = StateCodec.encodeKeyState(dec)
      assert(java.util.Arrays.equals(enc1, enc2), s"seed $seed: bytes differ")
      assert(dec.buffer.length == st.buffer.length, s"seed $seed: buffer length")
      st.buffer.zip(dec.buffer).zipWithIndex.foreach { case (((a, b), i)) =>
        assert(a._1 == b._1 && a._2 == b._2 &&
          a._3.toSeq == b._3.toSeq && a._4.toSeq == b._4.toSeq,
          s"seed $seed row $i: $a vs $b")
      }
      assert(dec.emittedTs == st.emittedTs && dec.emittedSeq == st.emittedSeq,
        s"seed $seed: emitted marks")
      assert(dec.nextSeq == st.nextSeq, s"seed $seed: nextSeq")
    }
  }
}
