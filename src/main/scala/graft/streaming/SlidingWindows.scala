package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

import graft.functions.SV

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
  * Aggregate kinds match the reference's window-aggregate registry
  * (src/runtime/operators/window/aggregates/mod.rs:104-120 — sum, avg,
  * count, min, max, stddev, stddev_pop, stddev_samp, var_pop, var_samp,
  * variance) plus the ML family the reference registers as retractable
  * UDAFs over the same windows (top, topn_frequency, top1_ratio,
  * {sum,avg,count,min,max}_cate — aggregates/mod.rs:184-199): tiles carry
  * count-map / per-category payloads so ML frames are also
  * O(buckets + edge), the reference's retractable-accumulator answer to
  * per-row frame recomputation (retractable_range.rs:54-140).
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

  /** One output aggregate.
    * kinds: sum count avg min max | stddev stddev_pop stddev_samp var_pop
    * var_samp variance | top topn_frequency top1_ratio |
    * {sum,avg,count,min,max}_cate. `n` is the top-N parameter where the
    * kind takes one.
    */
  final case class AggSpec(name: String, kind: String, frame: Frame, n: Int = 0)

  private[streaming] val cmKinds = Set("top", "topn_frequency", "top1_ratio")
  private[streaming] def isCate(kind: String): Boolean = kind.endsWith("_cate")
  private def isString(kind: String): Boolean =
    kind == "top" || kind == "topn_frequency" || isCate(kind)

  def outputSchema(specs: Seq[AggSpec], cate: Boolean): StructType =
    StructType(
      Seq(StructField("ts_ms", LongType), StructField("key", StringType),
          StructField("value", DoubleType)) ++
        (if (cate) Seq(StructField("cate", StringType)) else Nil) ++
        specs.map(s => StructField(s.name,
          if (isString(s.kind)) StringType else DoubleType)))

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
  // Tiles and per-key state
  // ------------------------------------------------------------------

  /** Tile: mergeable pre-aggregate of one time bucket. Numeric stats are
    * always kept; the count-map (`top` family) and per-category
    * (`*_cate` family) payloads only when some spec needs them
    * (reference: tiles carry accumulator state per agg —
    * state/tiles.rs:62-70).
    */
  final class Tile(needCm: Boolean, needCate: Boolean) extends Serializable {
    var sum: Double = 0.0
    var sum2: Double = 0.0
    var count: Long = 0L
    var min: Double = Double.NaN
    var max: Double = Double.NaN
    val cm: mutable.HashMap[Double, Long] =
      if (needCm) mutable.HashMap.empty else null
    /** cate -> [count, sum, min, max] over value. */
    val cate: mutable.HashMap[String, Array[Double]] =
      if (needCate) mutable.HashMap.empty else null
    def add(v: Double, c: String): Unit = {
      sum += v; sum2 += v * v; count += 1
      if (count == 1 || v < min) min = v
      if (count == 1 || v > max) max = v
      if (cm != null) cm.update(v, cm.getOrElse(v, 0L) + 1L)
      if (cate != null && c != null) {
        val a = cate.getOrElseUpdate(c, Array(0.0, 0.0, Double.NaN, Double.NaN))
        a(0) += 1; a(1) += v
        if (a(0) == 1 || v < a(2)) a(2) = v
        if (a(0) == 1 || v > a(3)) a(3) = v
      }
    }
  }

  /** Per-key state: event buffer (sorted by ts,seq), tile index, positions. */
  final class KeyState extends Serializable {
    /** (ts, seq, value, cate), ascending (ts, seq). */
    val buffer: mutable.ArrayBuffer[(Long, Long, Double, String)] = mutable.ArrayBuffer.empty
    /** granularity -> (bucketStart -> tile). Multi-granularity tiling per
      * the reference (state/tiles.rs:104-112 — default 1m/5m/1h/1d): long
      * frame interiors are covered greedily by the coarsest aligned tiles,
      * so a 30-day window costs tens of tile folds, not tens of
      * thousands. */
    val tiles: mutable.HashMap[Long, mutable.HashMap[Long, Tile]] = mutable.HashMap.empty
    var nextSeq: Long = 0L
    /** Highest (ts, seq) already emitted. */
    var emittedTs: Long = Long.MinValue
    var emittedSeq: Long = Long.MinValue
  }

  private[streaming] def insertSorted(st: KeyState, ts: Long, v: Double, c: String,
                           grans: Seq[Long], needCm: Boolean, needCate: Boolean): Unit = {
    val seq = st.nextSeq; st.nextSeq += 1
    val row = (ts, seq, v, c)
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
    grans.foreach { g =>
      st.tiles.getOrElseUpdate(g, mutable.HashMap.empty)
        .getOrElseUpdate(Math.floorDiv(ts, g) * g, new Tile(needCm, needCate))
        .add(v, c)
    }
  }

  @inline private[streaming] def ordLeq(ts1: Long, seq1: Long, ts2: Long, seq2: Long): Boolean =
    ts1 < ts2 || (ts1 == ts2 && seq1 <= seq2)

  // ------------------------------------------------------------------
  // Frame accumulator + finishers
  // ------------------------------------------------------------------

  /** Mergeable frame accumulator: folds raw rows and whole tiles. */
  private final class Acc(needCm: Boolean, needCate: Boolean) {
    var sum = 0.0; var sum2 = 0.0; var count = 0L
    var min = Double.NaN; var max = Double.NaN
    val cm: mutable.HashMap[Double, Long] =
      if (needCm) mutable.HashMap.empty else null
    val cate: mutable.HashMap[String, Array[Double]] =
      if (needCate) mutable.HashMap.empty else null

    def addRow(v: Double, c: String): Unit = {
      sum += v; sum2 += v * v; count += 1
      if (count == 1 || v < min) min = v
      if (count == 1 || v > max) max = v
      if (cm != null) cm.update(v, cm.getOrElse(v, 0L) + 1L)
      if (cate != null && c != null) {
        val a = cate.getOrElseUpdate(c, Array(0.0, 0.0, Double.NaN, Double.NaN))
        a(0) += 1; a(1) += v
        if (a(0) == 1 || v < a(2)) a(2) = v
        if (a(0) == 1 || v > a(3)) a(3) = v
      }
    }
    def addTile(t: Tile): Unit = {
      if (t.count > 0) {
        sum += t.sum; sum2 += t.sum2
        if (count == 0 || t.min < min) min = t.min
        if (count == 0 || t.max > max) max = t.max
        count += t.count
        if (cm != null) t.cm.foreach { case (v, n) => cm.update(v, cm.getOrElse(v, 0L) + n) }
        if (cate != null) t.cate.foreach { case (k, o) =>
          val a = cate.getOrElseUpdate(k, Array(0.0, 0.0, Double.NaN, Double.NaN))
          val was = a(0)
          a(0) += o(0); a(1) += o(1)
          if (was == 0 || o(2) < a(2)) a(2) = o(2)
          if (was == 0 || o(3) > a(3)) a(3) = o(3)
        }
      }
    }
  }

  /** Output formatting matches the batch ML aggregates exactly
    * (graft.functions.MlAggregates; reference format contract:
    * top/README.md "Common Output Format").
    */
  private def finish(spec: AggSpec, a: Acc): Any = spec.kind match {
    case "sum"   => a.sum
    case "count" => a.count.toDouble
    case "avg"   => if (a.count > 0) a.sum / a.count else Double.NaN
    case "min"   => a.min
    case "max"   => a.max
    case "var_pop" =>
      if (a.count > 0) math.max(0.0, (a.count * a.sum2 - a.sum * a.sum)) / (a.count.toDouble * a.count) else null
    case "var_samp" | "variance" =>
      if (a.count > 1) math.max(0.0, (a.count * a.sum2 - a.sum * a.sum)) / (a.count.toDouble * (a.count - 1)) else null
    case "stddev_pop" =>
      if (a.count > 0) math.sqrt(math.max(0.0, (a.count * a.sum2 - a.sum * a.sum)) / (a.count.toDouble * a.count)) else null
    case "stddev" | "stddev_samp" =>
      if (a.count > 1) math.sqrt(math.max(0.0, (a.count * a.sum2 - a.sum * a.sum)) / (a.count.toDouble * (a.count - 1))) else null
    case "top" =>
      val sorted = a.cm.toSeq.sortBy(-_._1)
      val out = new mutable.ArrayBuffer[String](spec.n)
      var remaining = spec.n
      val it = sorted.iterator
      while (remaining > 0 && it.hasNext) {
        val (v, cnt) = it.next()
        var i = math.min(cnt, remaining.toLong)
        val s = SV.formatFloat(v)
        while (i > 0) { out += s; i -= 1; remaining -= 1 }
      }
      out.mkString(",")
    case "topn_frequency" =>
      a.cm.toSeq.sortWith { case ((v1, c1), (v2, c2)) =>
        if (c1 != c2) c1 > c2 else v1 > v2
      }.take(spec.n).map(e => SV.formatFloat(e._1)).mkString(",")
    case "top1_ratio" =>
      if (a.cm.isEmpty) null
      else a.cm.valuesIterator.max.toDouble / a.cm.valuesIterator.sum.toDouble
    case k if isCate(k) =>
      val kind = k.stripSuffix("_cate")
      val parts = a.cate.toSeq.collect { case (c, arr) if arr(0) > 0 =>
        val r = kind match {
          case "sum"   => SV.formatFloat(arr(1))
          case "avg"   => SV.formatFloat(arr(1) / arr(0))
          case "count" => arr(0).toLong.toString
          case "min"   => SV.formatFloat(arr(2))
          case "max"   => SV.formatFloat(arr(3))
        }
        s"$c:$r"
      }.sorted
      parts.mkString(",")
  }

  /** RANGE frame: tiles over fully-covered interior buckets, raw rows at
    * the two edges. Frame = all buffered rows with ts in [lo, ts(upIdx)] —
    * including same-ts peers after upIdx (SQL RANGE semantics; all peers
    * <= watermark are buffered before emission). */
  private def rangeAcc(st: KeyState, lo: Long, upIdx: Int, grans: Seq[Long], a: Acc): Unit = {
    val gran = grans.head // finest: defines edge resolution
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
    if (lastFullEnd - firstFull >= gran) {
      // raw edge before the first full bucket
      var i = startIdx
      while (i <= endIdx && buf(i)._1 < firstFull) { a.addRow(buf(i)._3, buf(i)._4); i += 1 }
      // tiles over [firstFull, lastFullEnd): greedy coarsest-aligned walk
      // (a missing tile means no rows in that span — still advance)
      val desc = grans.reverse
      var b = firstFull
      while (b < lastFullEnd) {
        var step = gran
        var gi = 0
        var found = false
        while (!found && gi < desc.length) {
          val g = desc(gi)
          if (b % g == 0 && b + g <= lastFullEnd) { step = g; found = true }
          gi += 1
        }
        st.tiles.get(step).flatMap(_.get(b)).foreach(a.addTile)
        b += step
      }
      // raw edge: current bucket rows up to the peer end
      var k2 = endIdx
      while (k2 >= startIdx && buf(k2)._1 >= lastFullEnd) k2 -= 1
      var k3 = k2 + 1
      while (k3 <= endIdx) { a.addRow(buf(k3)._3, buf(k3)._4); k3 += 1 }
    } else {
      var i = startIdx
      while (i <= endIdx) { a.addRow(buf(i)._3, buf(i)._4); i += 1 }
    }
  }

  private[streaming] def evalSpec(st: KeyState, spec: AggSpec, upIdx: Int, grans: Seq[Long]): Any = {
    val needCm = cmKinds.contains(spec.kind)
    val needCate = isCate(spec.kind)
    val a = new Acc(needCm, needCate)
    spec.frame match {
      case RangeMs(len) => rangeAcc(st, st.buffer(upIdx)._1 - len, upIdx, grans, a)
      case RowsN(n) =>
        val buf = st.buffer
        var i = math.max(0, upIdx - n)
        while (i <= upIdx) { a.addRow(buf(i)._3, buf(i)._4); i += 1 }
    }
    finish(spec, a)
  }

  // ------------------------------------------------------------------
  // Streaming mode
  // ------------------------------------------------------------------

  /** Streaming per-row sliding windows.
    *
    * @param df        streaming frame with (tsMsCol: LONG event-time ms,
    *                  keyCol: STRING, valueCol: DOUBLE[, cateCol: STRING]);
    *                  bounded runs may union `flushRows` to force terminal
    *                  emission.
    * @param latenessMs allowed lateness: the withWatermark delay.
    * @param cateCol   optional category column for the `*_cate` kinds.
    * @return streaming frame (ts_ms, key, value[, cate], <one col per spec>)
    */
  def streaming(df: DataFrame, keyCol: String, tsMsCol: String, valueCol: String,
                specs: Seq[AggSpec], latenessMs: Long = 0,
                tileGranularityMs: Long = 60000L,
                cateCol: String = null,
                coarseTilesMs: Seq[Long] = Nil): DataFrame = {
    val grans = tileGrans(tileGranularityMs, coarseTilesMs)
    val hasCate = cateCol != null
    val outEnc = Encoders.row(outputSchema(specs, hasCate))
    val stateEnc = Encoders.kryo[KeyState]
    val maxRangeMs = specs.collect { case AggSpec(_, _, RangeMs(l), _) => l }.foldLeft(0L)(math.max)
    val maxRows = specs.collect { case AggSpec(_, _, RowsN(n), _) => n }.foldLeft(0)(math.max)
    val needCm = specs.exists(s => cmKinds.contains(s.kind) && s.frame.isInstanceOf[RangeMs])
    val needCate = specs.exists(s => isCate(s.kind) && s.frame.isInstanceOf[RangeMs])

    val prepared = df.select(
        col(tsMsCol).cast("long").as("__ts"),
        col(keyCol).cast("string").as("__key"),
        col(valueCol).cast("double").as("__value"),
        (if (hasCate) col(cateCol).cast("string") else lit(null).cast("string")).as("__cate"))
      .withColumn("__et", timestamp_millis(col("__ts")))
      .withWatermark("__et", s"$latenessMs milliseconds")

    import prepared.sparkSession.implicits._
    val grouped = prepared.as[(Long, String, Double, String, java.sql.Timestamp)]
      .groupByKey(_._2)

    val fn = (key: String, rows: Iterator[(Long, String, Double, String, java.sql.Timestamp)],
              state: GroupState[KeyState]) => {
      val st = state.getOption.getOrElse(new KeyState)
      val wm = state.getCurrentWatermarkMs()
      // ingest (drop terminal-flush sentinels and already-emitted positions)
      rows.foreach { r =>
        val ts = r._1
        if (ts != FLUSH_TS && ts > st.emittedTs)
          insertSorted(st, ts, r._3, r._4, grans, needCm, needCate)
      }
      // advance: emit every buffered row with ts <= wm not yet emitted
      val out = mutable.ArrayBuffer.empty[Row]
      val buf = st.buffer
      var i = 0
      // skip already-emitted prefix
      while (i < buf.length && ordLeq(buf(i)._1, buf(i)._2, st.emittedTs, st.emittedSeq)) i += 1
      while (i < buf.length && buf(i)._1 <= wm) {
        val (ts, seq, v, c) = buf(i)
        val aggs = specs.map(evalSpec(st, _, i, grans))
        val head = if (hasCate) Seq(ts, key, v, c) else Seq(ts, key, v)
        out += Row.fromSeq(head ++ aggs)
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
          st.tiles.foreach { case (g, m) =>
            m.filterInPlace { case (b, _) => b + g > tsHorizon }
          }
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

  // ------------------------------------------------------------------
  // Batch mode through the same engine
  // ------------------------------------------------------------------

  /** Batch evaluation through the SAME per-key engine (one sorted sweep
    * per key; RANGE frames covered by tiles). This is the scale path for
    * ML aggregates over long windows: Catalyst's WindowExec rebuilds a
    * TypedImperativeAggregate buffer per output row — O(n × frame) per
    * partition — while this sweep is O(n log n + n × (buckets + edge)),
    * the reference's retractable/tiled evaluation shape
    * (retractable_range.rs:54-140, tiles.rs:386-533).
    */
  def batchCompute(df: DataFrame, keyCol: String, tsMsCol: String,
                   valueCol: String, specs: Seq[AggSpec],
                   tileGranularityMs: Long = 60000L,
                   cateCol: String = null,
                   coarseTilesMs: Seq[Long] = Nil): DataFrame = {
    val grans = tileGrans(tileGranularityMs, coarseTilesMs)
    val hasCate = cateCol != null
    val outEnc = Encoders.row(outputSchema(specs, hasCate))
    val needCm = specs.exists(s => cmKinds.contains(s.kind) && s.frame.isInstanceOf[RangeMs])
    val needCate = specs.exists(s => isCate(s.kind) && s.frame.isInstanceOf[RangeMs])

    val prepared = df.select(
      col(tsMsCol).cast("long").as("__ts"),
      col(keyCol).cast("string").as("__key"),
      col(valueCol).cast("double").as("__value"),
      (if (hasCate) col(cateCol).cast("string") else lit(null).cast("string")).as("__cate"))

    import prepared.sparkSession.implicits._
    prepared.as[(Long, String, Double, String)]
      .groupByKey(_._2)
      .flatMapGroups { (key: String, rows: Iterator[(Long, String, Double, String)]) =>
        val st = new KeyState
        rows.foreach(r => insertSorted(st, r._1, r._3, r._4, grans, needCm, needCate))
        val buf = st.buffer
        (0 until buf.length).iterator.map { i =>
          val (ts, _, v, c) = buf(i)
          val aggs = specs.map(evalSpec(st, _, i, grans))
          val head = if (hasCate) Seq(ts, key, v, c) else Seq(ts, key, v)
          Row.fromSeq(head ++ aggs)
        }
      }(outEnc)
  }

  /** The reference's default tile hierarchy: 1m / 5m / 1h / 1d
    * (state/tiles.rs:104-112). Pass the tail as `coarseTilesMs` with a
    * 1-minute finest granularity. */
  val DefaultCoarseTilesMs: Seq[Long] = Seq(300000L, 3600000L, 86400000L)

  private[streaming] def tileGrans(finest: Long, coarse: Seq[Long]): Seq[Long] = {
    val grans = (finest +: coarse).distinct.sorted
    grans.foreach(g => require(g % grans.head == 0,
      s"tile granularity $g must be a multiple of the finest ${grans.head}"))
    grans
  }

  /** One terminal-flush row per key (the reference's MAX_WATERMARK) for
    * bounded inputs: push the watermark past every real event. */
  def flushRows(df: DataFrame, keyCol: String, tsMsCol: String, valueCol: String): DataFrame =
    df.select(col(keyCol).cast("string").as(keyCol)).distinct()
      .select(lit(FLUSH_TS).as(tsMsCol), col(keyCol), lit(0.0).as(valueCol))
}
