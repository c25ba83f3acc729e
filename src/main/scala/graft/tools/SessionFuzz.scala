package graft.tools

import java.util.Random

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession

/** Out-of-order SESSION-window fuzz with a MODEL-BASED oracle (VERDICT
  * r17 #1) — the one streaming shape family the r17 OOO family had to
  * exclude, because a late row touching an already-emitted session
  * legitimately re-opens it (a fresh session over the late rows) and the
  * engine double-emits: a batch SQL oracle over the final row set is
  * invalid by construction. The oracle here is [[SessionModel]]: a
  * single-threaded Scala reference of Spark's streaming session-window
  * semantics under the repo's two measured findings —
  *
  *   1. merge-on-TOUCH: an event at exactly last-ts + gap JOINS the
  *      session (family E's `diff > gap` strict new-session rule), so
  *      intervals merge when `next.start <= current.end`;
  *   2. the two-watermark split (WatermarkLagProbe, Spark 3.4+): batch
  *      j's LATE filter uses the watermark published after batches
  *      0..j-2 while EVICTION/emission uses 0..j-1 — so a row one batch
  *      behind the eviction wave still lands, and a row two batches
  *      behind is dropped.
  *
  * Per micro-batch the model (a) drops input rows whose would-be session
  * end `ts + gap` is at or below the late watermark, (b) merges the
  * survivors into per-key state as [ts, ts+gap) intervals (touch merges,
  * within the batch and against state — order-independent), (c) evicts
  * and EMITS every session whose end is at or below the eviction
  * watermark (append mode: merge first, then evict — Spark's
  * SessionWindowStateStoreSaveExec order). Re-opened sessions fall out
  * naturally: the late row's interval no longer touches any state (its
  * neighbours were evicted) and becomes a fresh session — the
  * double-emission the engine really produces.
  *
  * Delivery schedule mirrors the r17 OOO family: rows dealt into k
  * (3..5) slices by `(event_id + off) % k`, one file per slice, pinned
  * mtimes, `maxFilesPerTrigger=1` — every slice after the first carries
  * genuinely late rows. All aggregates are integer-exact; the compare is
  * an exact multiset over (key, session_start, session_end, aggs...).
  * session_start/end come from the ENGINE's `session_window` struct, so
  * the model's interval arithmetic is checked directly, not via
  * min/max-ts proxies.
  *
  * Reference semantics: `window_operator.rs:310-336` (session assignment
  * and merge in the reference engine).
  *
  * Usage: runMain graft.tools.SessionFuzz <sfDir> <outJson> [n] [seedBase]
  */
object SessionFuzz {

  import StreamFuzz.{evSpark, flushCut, pick, pickAggs, predOf,
    writeOrderedSlices, runStreaming, eventPools}

  /** One event in the model: (ts_ms, value_c). */
  type Ev = (Long, Long)

  /** An open or emitted session: [start, end) with its member events.
    * `end` is last-event-ts + gap, maintained through merges. */
  final case class Sess(start: Long, end: Long, rows: Vector[Ev])

  /** Single-threaded reference of Spark's streaming session-window
    * semantics (append mode) — see the object doc for the two pinned
    * findings it encodes. Returns every EMITTED session as
    * (key, start, end, events), in emission order. */
  object SessionModel {

    /** Merge-on-touch normalization of a set of intervals. */
    def mergeAll(ss: Seq[Sess]): Vector[Sess] = {
      val sorted = ss.sortBy(s => (s.start, s.end))
      val out = Vector.newBuilder[Sess]
      var cur: Sess = null
      sorted.foreach { s =>
        if (cur == null) cur = s
        else if (s.start <= cur.end) // touch merges (diff > gap is strict)
          cur = Sess(cur.start, math.max(cur.end, s.end), cur.rows ++ s.rows)
        else { out += cur; cur = s }
      }
      if (cur != null) out += cur
      out.result()
    }

    /** Coverage evidence for one model run: how many input rows the late
      * filter dropped and how many sessions emitted MID-stream (evicted
      * by a real watermark, not the terminal flush) — the two mechanics
      * that make this family non-trivial. A shape where both are zero is
      * an in-order replay wearing an OOO costume. */
    final case class Stats(lateDropped: Int, emittedMid: Int)

    /** @param slices  per-micro-batch input: (key, ts_ms, value_c)
      * @param gapMs   session gap
      * @param delayMs watermark delay
      * @return emitted sessions (key, start, end, rows) — including the
      *         terminal flush, which emits whatever state remains. */
    def run(slices: Seq[Seq[(String, Long, Long)]], gapMs: Long,
            delayMs: Long, lateLagBatches: Int = 1): (Seq[(String, Sess)], Stats) = {
      // wmAfter(j) = watermark published after batches 0..j-1 (monotone,
      // floored at 0) — eviction wm for batch j; the late filter lags one
      // batch: lateWm(j) = wmAfter(j-1), 0 for batches 0 and 1.
      // `lateLagBatches = 0` is the MUTATION knob (late filter == eviction
      // watermark, i.e. no two-watermark split): the fuzz run under it
      // must FAIL, or the corpus isn't actually exercising the lag.
      val wmAfter = slices.map(s =>
        if (s.isEmpty) None else Some(s.map(_._2).max))
        .scanLeft(0L)((wm, mt) => mt.map(t => math.max(wm, t - delayMs)).getOrElse(wm))
      val emitted = Vector.newBuilder[(String, Sess)]
      val state = scala.collection.mutable.HashMap.empty[String, Vector[Sess]]
      var lateDropped = 0
      var emittedMid = 0
      for (j <- slices.indices) {
        val lateWm = if (j < lateLagBatches) 0L else wmAfter(j - lateLagBatches)
        val evictWm = wmAfter(j)
        // (a) late filter: a row survives iff its would-be session END is
        // strictly past the late watermark (the q_late_drop absorption rule)
        val fresh = slices(j).filter { case (_, ts, _) => ts + gapMs > lateWm }
        lateDropped += slices(j).length - fresh.length
        // (b) merge into state — per key, batch rows and existing
        // sessions normalize together (commutative, order-independent)
        fresh.groupBy(_._1).foreach { case (key, rows) =>
          state(key) = mergeAll(state.getOrElse(key, Vector.empty) ++
            rows.map { case (_, ts, v) => Sess(ts, ts + gapMs, Vector((ts, v))) })
        }
        // (c) evict + emit: merge FIRST, then evict (save-exec order)
        state.keys.toSeq.foreach { key =>
          val (out, keep) = state(key).partition(_.end <= evictWm)
          out.foreach { s => emitted += ((key, s)); emittedMid += 1 }
          if (keep.isEmpty) state.remove(key) else state(key) = keep
        }
      }
      // terminal flush: the far-future sentinels push the watermark past
      // every real session; whatever is still open emits
      state.toSeq.sortBy(_._1).foreach { case (key, ss) =>
        ss.foreach(s => emitted += ((key, s)))
      }
      (emitted.result(), Stats(lateDropped, emittedMid))
    }

    /** True when two emitted sessions of one key overlap in time — the
      * double-emission only a re-opened (late-row) session can produce,
      * the semantics that made a batch SQL oracle invalid for this
      * family. */
    def hasDoubleEmission(emitted: Seq[(String, Sess)]): Boolean =
      emitted.groupBy(_._1).values.exists { ss =>
        val sorted = ss.map(_._2).sortBy(s => (s.start, s.end))
        sorted.lazyZip(sorted.drop(1)).exists((a, b) => b.start < a.end)
      }
  }

  /** Aggregate menu over the model's event list — mirrors
    * [[StreamFuzz.aggMenu]] alias-for-alias so the engine's columns line
    * up positionally. */
  private def modelAgg(alias: String, rows: Vector[Ev]): Long = alias match {
    case "n" => rows.length.toLong
    case "s" => rows.map(_._2).sum
    case "mn" => rows.map(_._2).min
    case "mx" => rows.map(_._2).max
    case "tmn" => rows.map(_._1).min
    case "tmx" => rows.map(_._1).max
  }

  private final case class Failure(name: String, seed: Long, detail: String)

  /** Runs one shape; returns None on match, Some(detail) on mismatch. */
  private[tools] def runShape(spark: SparkSession, i: Int, seedBase: Long,
                       pools: SqlFuzz.Pools, evT: SqlFuzz.Table,
                       counts: scala.collection.mutable.Map[String, Int],
                       lateLag: Int = 1)
      : Option[String] = {
    val r = new Random(seedBase + i)
    val k = 3 + r.nextInt(3)
    val off = r.nextInt(k)
    val gapMs = pick(r, Seq(600000L, 1800000L, 3600000L, 14400000L))
    val dMs = pick(r, Seq(0L, 60000L, 3600000L, 86400000L))
    val key = pick(r, Seq("user_id", "event_type"))
    val aggs = pickAggs(r)
    // predicate applies BATCH-SIDE, before slicing (same reasoning as the
    // r17 OOO family): both the engine and the model then see exactly the
    // rows that arrive, and the watermark schedule is theirs alone
    val pred = predOf(r, pools, evT)
    val sliceExpr = s"(event_id + $off) % $k"
    val in0 = spark.sql(evSpark).withColumn("k", col(key).cast("string"))
    val in = pred.fold(in0)(p => in0.where(p))
    val slices = (0 until k).map(j => in.where(s"$sliceExpr = $j"))

    // ---- model side -----------------------------------------------------
    val modelSlices: Seq[Seq[(String, Long, Long)]] = slices.map(df =>
      df.select("k", "ts_ms", "value_c").collect().toSeq
        .map(row => (row.getString(0), row.getLong(1), row.getLong(2))))
    counts("rows") += modelSlices.map(_.length).sum
    val (emitted, stats) = SessionModel.run(modelSlices, gapMs, dMs, lateLag)
    counts("late_dropped") += stats.lateDropped
    counts("mid_emissions") += stats.emittedMid
    if (stats.lateDropped > 0) counts("shapes_with_late_drops") += 1
    if (stats.emittedMid > 0) counts("shapes_with_mid_evictions") += 1
    if (SessionModel.hasDoubleEmission(emitted))
      counts("shapes_with_double_emission") += 1
    val want: Seq[Seq[Any]] = emitted.map { case (kv, s) =>
      Seq[Any](kv, s.start, s.end) ++ aggs.map(a => modelAgg(a._1, s.rows))
    }
    // a MUTATION run only proves anything on shapes whose schedule
    // actually distinguishes the mutated model from the correct one —
    // where they agree, the engine trivially matches both and the shape
    // can neither pass nor fail the all-red requirement. Classify it
    // instead of running the engine.
    if (lateLag != 1) {
      val (correct, _) = SessionModel.run(modelSlices, gapMs, dMs)
      val correctRows = correct.map { case (kv, s) =>
        Seq[Any](kv, s.start, s.end) ++ aggs.map(a => modelAgg(a._1, s.rows))
      }
      def key(rows: Seq[Seq[Any]]) = rows.map(_.map(String.valueOf).mkString("|")).sorted
      if (key(correctRows) == key(want)) return Some("LAG_INSENSITIVE")
    }

    // ---- engine side ----------------------------------------------------
    val root = GraftSession.tempDir(s"graft_sess_${i}_")
    writeOrderedSlices(slices.map(_.drop("k")), s"$root/in")
    val schema = spark.read.parquet(s"$root/in").schema
    val st = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$root/in")
      .withColumn("ts", timestamp_millis(col("ts_ms")))
      .withWatermark("ts", s"$dMs milliseconds")
    val aggCols = aggs.map(_._2)
    val grouped = st
      .groupBy(col(key).cast("string").as("k"),
        session_window(col("ts"), s"${gapMs / 1000} seconds"))
      .agg(aggCols.head, aggCols.tail: _*)
    val outCols = Seq("k", "session_start", "session_end") ++ aggs.map(_._1)
    val out = grouped
      .withColumn("session_start", unix_millis(col("session_window.start")))
      .withColumn("session_end", unix_millis(col("session_window.end")))
      .select(outCols.map(col): _*)
      .where(col("session_start") < flushCut)
    val landed = runStreaming(spark, out, root, Seq(s"$root/in"), 2)
      // the flush sentinel's own session (key '-1'/'zz') starts past
      // flushCut and is already filtered; real keys pass through
      .collect().toSeq.map(_.toSeq)

    // ---- exact multiset compare ------------------------------------------
    def sortKey(row: Seq[Any]): String = row.map(String.valueOf).mkString("|")
    val g = landed.sortBy(sortKey)
    val w = want.sortBy(sortKey)
    counts("sessions") += w.length
    if (w.exists(row => g.count(_ == row) != w.count(_ == row)) ||
        g.lengthCompare(w.length) != 0) {
      val missing = w.filterNot(g.contains).take(4).map(sortKey)
      val extra = g.filterNot(w.contains).take(4).map(sortKey)
      Some(s"rows engine=${g.length} model=${w.length} k=$k off=$off " +
        s"gap=$gapMs delay=$dMs key=$key aggs=${aggs.map(_._1).mkString(",")} " +
        s"pred=${pred.getOrElse("-")} missingFromEngine=$missing extraInEngine=$extra")
    } else None
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outJson = args(1)
    val n = if (args.length > 2) args(2).toInt else 150
    val seedBase = if (args.length > 3) args(3).toLong else 61000L
    // mode (arg 4): "nolag" runs the MUTATION — a model without the
    // two-watermark split. It exists to prove the corpus detects a wrong
    // model; a nolag sweep that comes back green means the shapes aren't
    // exercising the lag. "rocksdb" runs the CORRECT model with the
    // RocksDB state-store provider forced (VERDICT r18 #3): the
    // session-window save path (SessionWindowStateStoreSaveExec) was the
    // one streaming family the per-round ROCKSDB_SWEEP didn't cover —
    // the default-provider legs exercise it on HDFS only.
    val mode = if (args.length > 4) args(4) else ""
    val lateLag = if (mode == "nolag") 0 else 1
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.prepare(spark, sfDir)
    if (mode == "rocksdb")
      graft.streaming.StateStoreConf.setRocksDb(spark)
    // tiny streams: 4 state partitions (see StreamFuzz.main)
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    val (pools, evT, _) = eventPools(spark)

    val counts = scala.collection.mutable.Map(
      "rows" -> 0, "sessions" -> 0, "late_dropped" -> 0, "mid_emissions" -> 0,
      "shapes_with_late_drops" -> 0, "shapes_with_mid_evictions" -> 0,
      "shapes_with_double_emission" -> 0)
    val failures = Vector.newBuilder[Failure]
    var lagInsensitive = 0
    for (i <- 0 until n) {
      try {
        runShape(spark, i, seedBase, pools, evT, counts, lateLag) match {
          case Some("LAG_INSENSITIVE") =>
            lagInsensitive += 1
            println(s"[sessfuzz] sess_$i lag-insensitive (mutation can't bite) seed=${seedBase + i}")
          case Some(detail) =>
            failures += Failure(f"sess_$i%04d", seedBase + i, detail)
            println(s"[sessfuzz] MISMATCH sess_$i seed=${seedBase + i}: ${detail.take(500)}")
          case None =>
            if (i % 10 == 0) println(s"[sessfuzz] sess_$i ok seed=${seedBase + i}")
        }
      } catch {
        case e: Exception =>
          failures += Failure(f"sess_$i%04d", seedBase + i,
            "EXCEPTION: " + Option(e.getMessage).getOrElse(e.getClass.getName).take(400))
          println(s"[sessfuzz] FAIL sess_$i seed=${seedBase + i}: $e")
      }
    }
    val fails = failures.result()
    val report = graft.Metrics.toJson(Map(
      "tool" -> "graft.tools.SessionFuzz",
      "sf" -> sfDir,
      "n" -> n,
      "seed_base" -> seedBase,
      "late_lag_batches" -> lateLag,
      "provider" -> (if (mode == "rocksdb") "rocksdb" else "default(hdfs)"),
      "lag_insensitive" -> lagInsensitive,
      "total_input_rows" -> counts("rows"),
      "total_model_sessions" -> counts("sessions"),
      "total_late_dropped" -> counts("late_dropped"),
      "total_mid_emissions" -> counts("mid_emissions"),
      "shapes_with_late_drops" -> counts("shapes_with_late_drops"),
      "shapes_with_mid_evictions" -> counts("shapes_with_mid_evictions"),
      "shapes_with_double_emission" -> counts("shapes_with_double_emission"),
      "n_failed" -> fails.length,
      "failures" -> fails.map(f => Map(
        "name" -> f.name, "seed" -> f.seed, "detail" -> f.detail))))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outJson), report + "\n")
    println(s"[sessfuzz] ${n - fails.length}/$n green -> $outJson")
    spark.stop()
    if (fails.nonEmpty) sys.exit(2)
  }
}
