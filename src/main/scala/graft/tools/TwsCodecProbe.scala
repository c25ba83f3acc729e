package graft.tools

import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, Trigger, TTLConfig}

import graft.GraftSession
import graft.streaming.StateStoreConf

/** Minimal per-state-call floor probe for the `transformWithState` public
  * API (VERDICT r18 #1): the 100× scale record isolated the repo's one
  * super-linear slope to ~85 µs of per-touched-key overhead in the TWS
  * minhash engine (BENCH_sf10_r18.json `tws_slope_attribution` — provider
  * exonerated by a control run; 7.64M touched buckets, ~1 member each).
  * This probe strips away all minhash work and measures ONLY the state
  * machinery on identical input: K distinct keys, one `payload`-byte
  * binary value per key, one AvailableNow trigger, RocksDB provider for
  * every leg. Three engines over the same rows:
  *
  *  - `fmgws`      — `flatMapGroupsWithState`, `GroupState[Array[Byte]]`
  *                   (the shipping default engine's state surface; the
  *                   baseline the TWS legs are measured against)
  *  - `tws_value`  — `transformWithState`, one `ValueState[Array[Byte]]`
  *                   point get + put per key (the r19 consolidated-blob
  *                   layout of StreamingDedup.MinhashBucketProcessor)
  *  - `tws_list`   — `transformWithState`, `ListState[Array[Byte]]`
  *                   `get()` iterator + `appendValue` per key (the
  *                   r12–r18 per-member layout that measured slope 154.8)
  *
  * Per-key µs = (leg wall − fmgws wall) / K + fmgws's own per-key cost;
  * the report carries both raw walls and the deltas. If `tws_value` still
  * carries a material per-key floor over `fmgws`, that floor is Spark's
  * API machinery (implicit-key bookkeeping + the value-state codec), not
  * this repo's layout — the artifact pins it.
  *
  * Usage: runMain graft.tools.TwsCodecProbe <outJson> [keys=2000000]
  *   [payloadBytes=1040] [rounds=2]
  * Dev/measurement tool only — not part of the shipped library.
  */
object TwsCodecProbe {

  // identical inner work to the minhash processors' shell: read whatever
  // membership exists, write one payload, emit one row per input row
  private final class ValueLeg(payload: Int)
    extends StatefulProcessor[Long, (Long, Array[Byte]), Long] {
    @transient private var st: org.apache.spark.sql.streaming.ValueState[Array[Byte]] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Array[Byte]]("members", Encoders.BINARY,
        TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[(Long, Array[Byte])],
                                 timerValues: TimerValues): Iterator[Long] = {
      val prior = Option(st.get()).map(_.length.toLong).getOrElse(0L)
      var n = prior
      rows.foreach { case (_, v) => st.update(v); n += 1 }
      Iterator.single(n)
    }
  }

  private final class ListLeg(payload: Int)
    extends StatefulProcessor[Long, (Long, Array[Byte]), Long] {
    @transient private var st: org.apache.spark.sql.streaming.ListState[Array[Byte]] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getListState[Array[Byte]]("members", Encoders.BINARY,
        TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[(Long, Array[Byte])],
                                 timerValues: TimerValues): Iterator[Long] = {
      var n = 0L
      st.get().foreach(m => n += m.length.toLong)
      rows.foreach { case (_, v) => st.appendValue(v); n += 1 }
      Iterator.single(n)
    }
  }

  /** keyMode=binary twin of [[ValueLeg]]: keys are 33-byte BINARY — the
    * streaming-dedup entry's band-key shape — instead of Long. Isolates
    * whether the TWS-vs-FMGWS entry gap (BENCH_sf10_sdd_r20: same-provider
    * ratio 2.14 where the Long-key probe shows parity) is the operator's
    * handling of non-primitive grouping keys. */
  private final class ValueLegB(payload: Int)
    extends StatefulProcessor[Array[Byte], (Array[Byte], Array[Byte]), Long] {
    @transient private var st: org.apache.spark.sql.streaming.ValueState[Array[Byte]] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Array[Byte]]("members", Encoders.BINARY,
        TTLConfig.NONE)
    override def handleInputRows(key: Array[Byte], rows: Iterator[(Array[Byte], Array[Byte])],
                                 timerValues: TimerValues): Iterator[Long] = {
      val prior = Option(st.get()).map(_.length.toLong).getOrElse(0L)
      var n = prior
      rows.foreach { case (_, v) => st.update(v); n += 1 }
      Iterator.single(n)
    }
  }

  private final class ListLegB(payload: Int)
    extends StatefulProcessor[Array[Byte], (Array[Byte], Array[Byte]), Long] {
    @transient private var st: org.apache.spark.sql.streaming.ListState[Array[Byte]] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getListState[Array[Byte]]("members", Encoders.BINARY,
        TTLConfig.NONE)
    override def handleInputRows(key: Array[Byte], rows: Iterator[(Array[Byte], Array[Byte])],
                                 timerValues: TimerValues): Iterator[Long] = {
      var n = 0L
      st.get().foreach(m => n += m.length.toLong)
      rows.foreach { case (_, v) => st.appendValue(v); n += 1 }
      Iterator.single(n)
    }
  }

  def main(args: Array[String]): Unit = {
    val outJson = args(0)
    val keys = if (args.length > 1) args(1).toLong else 2000000L
    val payload = if (args.length > 2) args(2).toInt else 1040
    val rounds = if (args.length > 3) args(3).toInt else 2
    // keyMode=binary: 33-byte binary keys (md5 prefix + embedded id —
    // distinct by construction, pseudorandom like the entry's band keys)
    val keyMode = if (args.length > 4) args(4) else "long"

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-tws-codec-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // every leg on the SAME provider — the r18 control already exonerated
    // the provider; this probe varies only the state API surface
    StateStoreConf.setRocksDb(spark)

    // K distinct keys, one row each — the minhash shape at 100× (7.64M
    // touched buckets averaging ~1 member); deterministic payload
    val root = GraftSession.tempDir("graft_twsprobe_")
    val inDir = s"$root/in"
    val keyCol =
      if (keyMode == "binary")
        expr("unhex(concat(md5(CAST(id AS STRING)), lpad(hex(id), 18, '0'), repeat('ab', 8)))")
      else col("id")
    spark.range(keys).select(keyCol.as("id"),
        expr(s"CAST(repeat('a', $payload) AS BINARY)").as("payload"))
      .write.parquet(inDir)
    val inSchema = spark.read.parquet(inDir).schema

    def buildLeg(leg: String, src: String): org.apache.spark.sql.Dataset[Long] = {
      if (keyMode == "binary") {
        val streamIn = spark.readStream.schema(inSchema).parquet(src)
          .as[(Array[Byte], Array[Byte])]
        val grouped = streamIn.groupByKey(_._1)(Encoders.BINARY)
        leg match {
          case "fmgws" =>
            grouped.flatMapGroupsWithState(
              OutputMode.Append, GroupStateTimeout.NoTimeout)(
              (_: Array[Byte], rows: Iterator[(Array[Byte], Array[Byte])],
               state: GroupState[Array[Byte]]) => {
                val prior = state.getOption.map(_.length.toLong).getOrElse(0L)
                var n = prior
                rows.foreach { case (_, v) => state.update(v); n += 1 }
                Iterator.single(n)
              })
          case "tws_value" =>
            grouped.transformWithState(new ValueLegB(payload), TimeMode.None(),
              OutputMode.Append())
          case "tws_list" =>
            grouped.transformWithState(new ListLegB(payload), TimeMode.None(),
              OutputMode.Append())
        }
      } else {
        val streamIn = spark.readStream.schema(inSchema).parquet(src)
          .as[(Long, Array[Byte])]
        val grouped = streamIn.groupByKey(_._1)
        leg match {
          case "fmgws" =>
            grouped.flatMapGroupsWithState(
              OutputMode.Append, GroupStateTimeout.NoTimeout)(
              (key: Long, rows: Iterator[(Long, Array[Byte])],
               state: GroupState[Array[Byte]]) => {
                val prior = state.getOption.map(_.length.toLong).getOrElse(0L)
                var n = prior
                rows.foreach { case (_, v) => state.update(v); n += 1 }
                Iterator.single(n)
              })
          case "tws_value" =>
            grouped.transformWithState(new ValueLeg(payload), TimeMode.None(),
              OutputMode.Append())
          case "tws_list" =>
            grouped.transformWithState(new ListLeg(payload), TimeMode.None(),
              OutputMode.Append())
        }
      }
    }

    def runLeg(leg: String, tag: String): Double = {
      val ckpt = s"$root/ckpt_$tag"
      val out = buildLeg(leg, inDir)
      val t0 = System.nanoTime()
      val q = out.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .format("noop")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      (System.nanoTime() - t0) / 1e9
    }

    // interleaved rounds, min per leg: one JVM, so first-round JIT bills
    // to whichever leg runs first — a throwaway warm pass (small key
    // count) compiles all three shapes before anything is timed
    Seq("fmgws", "tws_value", "tws_list").foreach { leg =>
      val warmDir = s"$root/warm_$leg"
      spark.range(1000).select(keyCol.as("id"),
          expr(s"CAST(repeat('a', $payload) AS BINARY)").as("payload"))
        .write.parquet(warmDir)
      val ckpt = s"$root/warmckpt_$leg"
      val q = buildLeg(leg, warmDir).writeStream
        .option("checkpointLocation", ckpt).format("noop")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    val walls = scala.collection.mutable.LinkedHashMap.empty[String, Seq[Double]]
    for (r <- 1 to rounds; leg <- Seq("fmgws", "tws_value", "tws_list")) {
      val w = runLeg(leg, s"${leg}_$r")
      walls(leg) = walls.getOrElse(leg, Nil) :+ w
      println(f"[twsprobe] round $r $leg%-10s ${w}%8.1f s")
    }
    val best = walls.map { case (k, v) => k -> v.min }
    val perKeyUs = best.map { case (k, v) => k -> v * 1e6 / keys }
    val deltaUs = Seq("tws_value", "tws_list").map(k =>
      k -> (perKeyUs(k) - perKeyUs("fmgws"))).toMap

    val report = graft.Metrics.toJson(Map(
      "tool" -> "graft.tools.TwsCodecProbe",
      "what" -> ("per-touched-key state-machinery floor: K single-row keys, " +
        "one binary payload each, one AvailableNow trigger, RocksDB provider " +
        "on every leg — the only variable is the state API surface " +
        "(flatMapGroupsWithState GroupState vs transformWithState " +
        "ValueState vs ListState). Deltas over the fmgws leg are the " +
        "public-API overhead the BENCH_sf10 tws slope pays per touched " +
        "bucket."),
      "keys" -> keys,
      "payload_bytes" -> payload,
      "rounds" -> rounds,
      "key_mode" -> keyMode,
      "cpus" -> cpus,
      "wall_sec_all_rounds" -> walls.map { case (k, v) => k -> v }.toMap,
      "wall_sec_best" -> best.toMap,
      "per_key_us" -> perKeyUs.map { case (k, v) =>
        k -> math.round(v * 100.0) / 100.0 }.toMap,
      "tws_over_fmgws_us_per_key" -> deltaUs.map { case (k, v) =>
        k -> math.round(v * 100.0) / 100.0 }))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outJson),
      report + "\n")
    println(s"[twsprobe] -> $outJson")
    spark.stop()
  }
}
