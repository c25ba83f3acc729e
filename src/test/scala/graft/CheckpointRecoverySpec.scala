package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.SlidingWindows
import graft.streaming.SlidingWindows.{AggSpec, RangeMs, RowsN}

/** Kill/recovery semantics (mirrors the reference's checkpoint tests —
  * src/runtime/tests/checkpoint_tests/kill_recovery.rs): a streaming
  * window query with a DURABLE checkpoint is stopped mid-stream and
  * restarted; the restarted query must restore per-key window state from
  * the state store and the combined output must be exactly-once equal to
  * the batch reference — no lost rows, no duplicates, no frames computed
  * from truncated state.
  */
class CheckpointRecoverySpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("stop + restart from a durable checkpoint is exactly-once and state-correct") {
    runKillRecovery(tws = false)
  }

  test("transformWithState engine: stop + restart from a durable checkpoint is exactly-once") {
    runKillRecovery(tws = true)
  }

  private def runKillRecovery(tws: Boolean): Unit = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val events = (0 until 600).map { i =>
      (1704067200000L + 700L * i, s"k${i % 3}", (i * 5 % 23) / 4.0)
    }
    val specs = Seq(AggSpec("sum_10s", "sum", RangeMs(10000)),
                    AggSpec("avg_5r", "avg", RowsN(4)))

    val root = Files.createTempDirectory("graft_ckpt_").toString
    val outDir = s"$root/out"; val ckpt = s"$root/ckpt"

    val mem = MemoryStream[(Long, String, Double)]
    val src = mem.toDF().toDF("ts_ms", "key", "value")
    val out =
      if (tws) graft.streaming.SlidingWindowsTws.streaming(src,
        "key", "ts_ms", "value", specs, latenessMs = 0, tileGranularityMs = 2000)
      else SlidingWindows.streaming(src,
        "key", "ts_ms", "value", specs, latenessMs = 0, tileGranularityMs = 2000)

    def start() = out.writeStream.outputMode("append").format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime(0)).start()

    // phase 1: first half, committed, then "kill"
    val q1 = start()
    val (h1, h2) = events.splitAt(300)
    h1.grouped(120).foreach { b => mem.addData(b: _*); q1.processAllAvailable() }
    q1.stop()

    // phase 2: restart from the checkpoint, stream the rest, flush
    val q2 = start()
    h2.grouped(120).foreach { b => mem.addData(b: _*); q2.processAllAvailable() }
    val keys = events.map(_._2).distinct
    mem.addData(keys.map(k => (SlidingWindows.FLUSH_TS, k, 0.0)): _*)
    q2.processAllAvailable()
    mem.addData((SlidingWindows.FLUSH_TS, keys.head, 0.0))
    q2.processAllAvailable()
    q2.stop()

    // exactly-once: parquet sink output == batch OVER reference, as a
    // multiset (duplicated emission would fail the size check)
    val got = spark.read.parquet(outDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        R.r6(r.getDouble(3)), R.r6(r.getDouble(4)))).toSeq.sorted
    events.toDF("ts_ms", "key", "value").createOrReplaceTempView("ckpt_evt")
    val want = spark.sql("""
      SELECT ts_ms, key, value,
             sum(value) OVER (PARTITION BY key ORDER BY ts_ms
               RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) AS sum_10s,
             avg(value) OVER (PARTITION BY key ORDER BY ts_ms
               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS avg_5r
      FROM ckpt_evt
    """).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        R.r6(r.getDouble(3)), R.r6(r.getDouble(4)))).toSeq.sorted
    assert(got.size == want.size, "row count (exactly-once)")
    assert(got == want)

    // frames spanning the kill boundary came from RESTORED state: rows
    // emitted after restart reference pre-kill rows in their 10s frames
    // (700ms spacing x 3 keys means every frame spans ~4-5 prior rows).
    val boundaryTs = events(300)._1
    assert(want.exists { case (ts, _, _, s, _) => ts >= boundaryTs && s > 0 })
  }
}
