package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Per-row sliding OVER-window engine with streaming emission — the core
  * capability of the reference engine, re-expressed on Structured Streaming.
  *
  * Semantics transcribed from the reference WindowOperator
  * (src/runtime/operators/window/window_operator.rs:292-390):
  *  - rows buffer per key; when the watermark advances, every buffered row
  *    with ts <= watermark is emitted exactly once, in (ts, seq) order,
  *    carrying the input columns plus one aggregate column per window over
  *    its frame (`RANGE x PRECEDING AND CURRENT ROW` / `ROWS n PRECEDING`);
  *  - rows at or before the per-key emitted position are dropped (allowed
  *    lateness = the `withWatermark` delay, so Spark's late-row filter
  *    implements the `wm - lateness` cutoff);
  *  - a terminal flush row (`ts = FLUSH_TS`) plays the reference's
  *    MAX_WATERMARK role for bounded runs (message.rs:191);
  *  - frame evaluation over RANGE windows uses *tiles* — pre-aggregated
  *    time buckets covering the frame interior, raw rows only at the edges
  *    (state/tiles.rs:386-533) — so long windows cost O(buckets + edge)
  *    instead of O(rows); ROWS frames scan the tail of the buffer.
  *
  * State lives in the Structured Streaming state store (RocksDB-backed on
  * a real cluster), keyed by the PARTITION BY column — the same hash
  * distribution the reference builds with its KeyBy operator.
  */
object SlidingWindows {

  /** Terminal-watermark sentinel timestamp (2100-01-01 UTC, ms).
    * Note: Spark's watermark starts at 0 and drops rows at event-time <=
    * watermark, so event times must be > 0 (epoch ms of real data always is).
    */
  val FLUSH_TS: Long = 4102444800000L

  sealed trait Frame extends Serializable
  /** RANGE BETWEEN lenMs PRECEDING AND CURRENT ROW over event time ms. */
  final case class RangeMs(lenMs: Long) extends Frame
  /** ROWS BETWEEN n PRECEDING AND CURRENT ROW in (ts, seq) order. */
  final case class RowsN(n: Int) extends Frame

  /** One output aggregate: built-in kinds sum/count/avg/min/max. */
  final case class AggSpec(name: String, kind: String, frame: Frame)

  // ------------------------------------------------------------------
  // Batch mode: plain Catalyst OVER windows (exact same semantics).
  // ------------------------------------------------------------------

  def batchSql(table: String, keyCol: String, tsCol: String, valueCol: String,
               specs: Seq[AggSpec]): String = {
    val cols = specs.map { s =>
      val fn = s.kind match {
        case "count" => s"count($valueCol)"
        case k       => s"$k($valueCol)"
      }
      val frame = s.frame match {
        case RangeMs(len) =>
          s"(PARTITION BY $keyCol ORDER BY $tsCol RANGE BETWEEN $len PRECEDING AND CURRENT ROW)"
        case RowsN(n) =>
          s"(PARTITION BY $keyCol ORDER BY $tsCol, __seq ROWS BETWEEN $n PRECEDING AND CURRENT ROW)"
      }
      s"$fn OVER $frame AS ${s.name}"
    }
    s"SELECT $tsCol, $keyCol, $valueCol, ${cols.mkString(", ")} FROM $table"
  }

  // ------------------------------------------------------------------
  // Streaming mode
  // ------------------------------------------------------------------

  /** Tile: mergeable pre-aggregate of one time bucket. */
  final class Tile extends Serializable {
    var sum: Double = 0.0
    var count: Long = 0L
    var min: Double = Double.NaN
    var max: Double = Double.NaN
    def add(v: Double): Unit = {
      sum += v; count += 1
      if (count == 1 || v < min) min = v
      if (count == 1 || v > max) max = v
    }
  }

  /** Per-key state: event buffer (sorted by ts,seq), tile index, positions. */
  final class KeyState extends Serializable {
    /** (ts, seq, value), ascending (ts, seq). */
    val buffer: mutable.ArrayBuffer[(Long, Long, Double)] = mutable.ArrayBuffer.empty
    /** bucketStart -> tile, at `tileGranularityMs`. */
    val tiles: mutable.HashMap[Long, Tile] = mutable.HashMap.empty
    var nextSeq: Long = 0L
    /** Highest (ts, seq) already emitted. */
    var emittedTs: Long = Long.MinValue
    var emittedSeq: Long = Long.MinValue
  }

  private def insertSorted(st: KeyState, ts: Long, v: Double, gran: Long): Unit = {
    val seq = st.nextSeq; st.nextSeq += 1
    val row = (ts, seq, v)
    val buf = st.buffer
    if (buf.isEmpty || ordLeq(buf.last._1, buf.last._2, ts, seq)) buf += row
    else {
      // binary search by (ts, seq)
      var lo = 0; var hi = buf.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (ordLeq(buf(mid)._1, buf(mid)._2, ts, seq)) lo = mid + 1 else hi = mid
      }
      buf.insert(lo, row)
    }
    st.tiles.getOrElseUpdate(Math.floorDiv(ts, gran) * gran, new Tile).add(v)
  }

  @inline private def ordLeq(ts1: Long, seq1: Long, ts2: Long, seq2: Long): Boolean =
    ts1 < ts2 || (ts1 == ts2 && seq1 <= seq2)

  /** RANGE frame aggregate: tiles over fully-covered interior buckets, raw
    * rows at the two edges. Frame = all buffered rows with ts in
    * [lo, ts(upIdx)] — including same-ts peers after upIdx (SQL RANGE
    * semantics; all peers <= watermark are buffered before emission). */
  private def rangeAgg(st: KeyState, kind: String, lo: Long, upIdx: Int, gran: Long): Double = {
    val buf = st.buffer
    val hiTs = buf(upIdx)._1
    // include peers: last index with ts == hiTs
    var endIdx = upIdx
    while (endIdx + 1 < buf.length && buf(endIdx + 1)._1 == hiTs) endIdx += 1
    // first index with ts >= lo
    var s = 0; var e = endIdx
    while (s < e) {
      val mid = (s + e) >>> 1
      if (buf(mid)._1 < lo) s = mid + 1 else e = mid
    }
    val startIdx = s
    // interior tile span: buckets fully inside [lo, current bucket)
    val firstFull = Math.floorDiv(lo + gran - 1, gran) * gran // first bucket start >= lo
    val lastFullEnd = Math.floorDiv(hiTs, gran) * gran        // current row's bucket start
    var sum = 0.0; var count = 0L
    var min = Double.NaN; var max = Double.NaN
    @inline def fold(s2: Double, c2: Long, mn2: Double, mx2: Double): Unit = {
      if (c2 > 0) {
        sum += s2
        if (count == 0 || mn2 < min) min = mn2
        if (count == 0 || mx2 > max) max = mx2
        count += c2
      }
    }
    if (lastFullEnd - firstFull >= gran) {
      // raw edge before the first full bucket
      var i = startIdx
      while (i <= endIdx && buf(i)._1 < firstFull) { fold(buf(i)._3, 1, buf(i)._3, buf(i)._3); i += 1 }
      // tiles over [firstFull, lastFullEnd)
      var b = firstFull
      while (b < lastFullEnd) {
        st.tiles.get(b).foreach(t => fold(t.sum, t.count, t.min, t.max))
        b += gran
      }
      // raw edge: current bucket rows up to the peer end
      var k2 = endIdx
      while (k2 >= startIdx && buf(k2)._1 >= lastFullEnd) k2 -= 1
      var k3 = k2 + 1
      while (k3 <= endIdx) { fold(buf(k3)._3, 1, buf(k3)._3, buf(k3)._3); k3 += 1 }
    } else {
      var i = startIdx
      while (i <= endIdx) { fold(buf(i)._3, 1, buf(i)._3, buf(i)._3); i += 1 }
    }
    finish(kind, sum, count, min, max)
  }

  private def rowsAgg(st: KeyState, kind: String, n: Int, upIdx: Int): Double = {
    val buf = st.buffer
    val startIdx = math.max(0, upIdx - n)
    var sum = 0.0; var count = 0L; var min = Double.NaN; var max = Double.NaN
    var i = startIdx
    while (i <= upIdx) {
      val v = buf(i)._3
      sum += v; count += 1
      if (count == 1 || v < min) min = v
      if (count == 1 || v > max) max = v
      i += 1
    }
    finish(kind, sum, count, min, max)
  }

  @inline private def finish(kind: String, sum: Double, count: Long, min: Double, max: Double): Double =
    kind match {
      case "sum"   => sum
      case "count" => count.toDouble
      case "avg"   => if (count > 0) sum / count else Double.NaN
      case "min"   => min
      case "max"   => max
    }

  /** Streaming per-row sliding windows.
    *
    * @param df        streaming frame with (tsMsCol: LONG event-time ms,
    *                  keyCol: STRING, valueCol: DOUBLE); bounded runs may
    *                  union `flushRows` to force terminal emission.
    * @param latenessMs allowed lateness: the withWatermark delay.
    * @return streaming frame (ts_ms, key, value, <one double per spec>)
    */
  def streaming(df: DataFrame, keyCol: String, tsMsCol: String, valueCol: String,
                specs: Seq[AggSpec], latenessMs: Long = 0,
                tileGranularityMs: Long = 60000L): DataFrame = {
    val outSchema = StructType(
      Seq(StructField("ts_ms", LongType), StructField("key", StringType),
          StructField("value", DoubleType)) ++
        specs.map(s => StructField(s.name, DoubleType)))
    val outEnc = Encoders.row(outSchema)
    val stateEnc = Encoders.kryo[KeyState]
    val maxRangeMs = specs.collect { case AggSpec(_, _, RangeMs(l)) => l }.foldLeft(0L)(math.max)
    val maxRows = specs.collect { case AggSpec(_, _, RowsN(n)) => n }.foldLeft(0)(math.max)

    val prepared = df.select(
        col(tsMsCol).cast("long").as("__ts"),
        col(keyCol).cast("string").as("__key"),
        col(valueCol).cast("double").as("__value"))
      .withColumn("__et", timestamp_millis(col("__ts")))
      .withWatermark("__et", s"$latenessMs milliseconds")

    import prepared.sparkSession.implicits._
    val grouped = prepared.as[(Long, String, Double, java.sql.Timestamp)]
      .groupByKey(_._2)

    val fn = (key: String, rows: Iterator[(Long, String, Double, java.sql.Timestamp)],
              state: GroupState[KeyState]) => {
      val st = state.getOption.getOrElse(new KeyState)
      val wm = state.getCurrentWatermarkMs()
      // ingest (drop terminal-flush sentinels and already-emitted positions)
      rows.foreach { r =>
        val ts = r._1
        if (ts != FLUSH_TS && ts > st.emittedTs) insertSorted(st, ts, r._3, tileGranularityMs)
      }
      // advance: emit every buffered row with ts <= wm not yet emitted
      val out = mutable.ArrayBuffer.empty[Row]
      val buf = st.buffer
      var i = 0
      // skip already-emitted prefix
      while (i < buf.length && ordLeq(buf(i)._1, buf(i)._2, st.emittedTs, st.emittedSeq)) i += 1
      while (i < buf.length && buf(i)._1 <= wm) {
        val (ts, seq, v) = buf(i)
        val aggs = specs.map {
          case AggSpec(_, kind, RangeMs(len)) => rangeAgg(st, kind, ts - len, i, tileGranularityMs)
          case AggSpec(_, kind, RowsN(n))     => rowsAgg(st, kind, n, i)
        }
        out += Row.fromSeq(Seq(ts, key, v) ++ aggs)
        st.emittedTs = ts; st.emittedSeq = seq
        i += 1
      }
      // prune: drop the emitted prefix no future frame can reference —
      // a row is droppable only if it fails BOTH the RANGE horizon
      // (ts < emittedTs - maxRange) and the ROWS lookback (more than
      // maxRows before the first unemitted row).
      {
        val tsHorizon = st.emittedTs - maxRangeMs
        var tsOk = 0
        while (tsOk < buf.length && buf(tsOk)._1 < tsHorizon) tsOk += 1
        val dropTo = math.min(tsOk, math.max(0, i - maxRows))
        if (dropTo > 0) {
          buf.remove(0, dropTo)
          st.tiles.filterInPlace { case (b, _) => b + tileGranularityMs > tsHorizon }
        }
      }
      state.update(st)
      // wake up when the watermark reaches the earliest unemitted row
      var j = 0
      while (j < buf.length && ordLeq(buf(j)._1, buf(j)._2, st.emittedTs, st.emittedSeq)) j += 1
      if (j < buf.length) state.setTimeoutTimestamp(math.max(buf(j)._1, wm + 1))
      out.iterator
    }

    grouped.flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)(stateEnc, outEnc)
  }

  /** One terminal-flush row per key (the reference's MAX_WATERMARK) for
    * bounded inputs: push the watermark past every real event. */
  def flushRows(df: DataFrame, keyCol: String, tsMsCol: String, valueCol: String): DataFrame =
    df.select(col(keyCol).cast("string").as(keyCol)).distinct()
      .select(lit(FLUSH_TS).as(tsMsCol), col(keyCol), lit(0.0).as(valueCol))
}
