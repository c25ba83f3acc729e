package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.SlidingWindows
import graft.streaming.SlidingWindows.{AggSpec, RangeMs, RowsN}

object R { // tile-based sums reorder float additions vs batch's scan order
  def r6(d: Double): Double = math.round(d * 1e6) / 1e6
}

/** Reference-model test (mirrors window_operator_tests.rs:621 comparison
  * style): the streaming per-row sliding-window engine must produce
  * exactly the batch OVER-window result on the same input, under
  * out-of-order micro-batched arrival.
  */
class SlidingWindowsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private val specs = Seq(
    AggSpec("sum_10s", "sum", RangeMs(10000)),
    AggSpec("cnt_10s", "count", RangeMs(10000)),
    AggSpec("min_10s", "min", RangeMs(10000)),
    AggSpec("max_10s", "max", RangeMs(10000)),
    AggSpec("avg_5r", "avg", RowsN(5)))

  /** Deterministic synthetic events: 3 keys, unique ts per key. */
  private def events: Seq[(Long, String, Double)] = {
    val rnd = new scala.util.Random(1234)
    (0 until 600).map { i =>
      val key = s"k${i % 3}"
      // epoch-2024 base: Spark's initial watermark is 0 and rows at
      // event-time <= watermark are dropped, so ts must be > 0
      val ts = 1704067200000L + 1000L * i + (i % 3)
      (ts, key, math.round(rnd.nextDouble() * 1000) / 10.0)
    }
  }

  private def batchReference(rows: Seq[(Long, String, Double)]): Set[(Long, String, Double, Double, Double, Double, Double, Double)] = {
    import spark.implicits._
    rows.toDF("ts_ms", "key", "value").createOrReplaceTempView("evt")
    spark.sql("""
      SELECT ts_ms, key, value,
             sum(value)   OVER w AS sum_10s,
             count(value) OVER w AS cnt_10s,
             min(value)   OVER w AS min_10s,
             max(value)   OVER w AS max_10s,
             avg(value)   OVER (PARTITION BY key ORDER BY ts_ms
               ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS avg_5r
      FROM evt
      WINDOW w AS (PARTITION BY key ORDER BY ts_ms
                   RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW)
    """).collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
      R.r6(r.getDouble(3)), r.getLong(4).toDouble, r.getDouble(5), r.getDouble(6),
      R.r6(r.getDouble(7)))).toSet
  }

  private def runStreaming(batches: Seq[Seq[(Long, String, Double)]],
                           lateness: Long, tileGran: Long): Set[(Long, String, Double, Double, Double, Double, Double, Double)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Double)]
    val df = mem.toDF().toDF("ts_ms", "key", "value")
    val out = SlidingWindows.streaming(df, "key", "ts_ms", "value", specs,
      latenessMs = lateness, tileGranularityMs = tileGran)
    val qname = s"slwin_out_${System.nanoTime()}"
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName(qname).trigger(Trigger.ProcessingTime(0)).start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      // terminal watermark: flush sentinels per key
      val keys = batches.flatten.map(_._2).distinct
      mem.addData(keys.map(k => (SlidingWindows.FLUSH_TS, k, 0.0)): _*)
      q.processAllAvailable()
      // one more empty-ish batch so event-time timeouts fire after the jump
      mem.addData((SlidingWindows.FLUSH_TS, keys.head, 0.0))
      q.processAllAvailable()
      spark.table(qname).collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        R.r6(r.getDouble(3)), r.getDouble(4), r.getDouble(5), r.getDouble(6),
        R.r6(r.getDouble(7)))).toSet
    } finally q.stop()
  }

  test("streaming engine == batch OVER windows, in-order single batch") {
    val evs = events
    val got = runStreaming(Seq(evs), lateness = 0, tileGran = 2000)
    assert(got == batchReference(evs))
  }

  test("streaming engine == batch OVER windows, out-of-order micro-batches with lateness") {
    val rnd = new scala.util.Random(77)
    val shuffled = rnd.shuffle(events)
    // 12 batches of 50, each locally shuffled: within-lateness disorder
    val batches = shuffled.sortBy(_._1).grouped(60).toSeq.map(b => rnd.shuffle(b))
    val got = runStreaming(batches, lateness = 120000, tileGran = 3000)
    assert(got == batchReference(events))
  }

  test("q_window_streaming catalog entry == batch OVER windows on sf0.001 events") {
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("q_window_streaming")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))
      .toSeq.sorted
    val want = spark.sql("""
      SELECT ts_ms, CAST(user_id AS STRING) AS key,
             CAST(value_c AS DOUBLE) / 100 AS value,
             CAST(sum(value_c) OVER w AS DOUBLE) / 100 AS sum_1h,
             count(*) OVER w AS cnt_1h
      FROM (SELECT ts DIV 1000000 AS ts_ms, user_id,
                   CAST(round(value * 100) AS BIGINT) AS value_c FROM events)
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms
                   RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW)
    """).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))
      .toSeq.sorted
    assert(got.size == want.size)
    assert(got == want)
  }

  test("late rows beyond watermark are dropped, not wrong") {
    // batch 1 advances the watermark far; batch 2's old row must be dropped
    val b1 = (0 until 100).map(i => (1704067200000L + 1000L * i, "k", i.toDouble))
    val late = Seq((1704067201000L, "k", 999.0)) // far behind watermark (lateness 0)
    val got = runStreaming(Seq(b1, late), lateness = 0, tileGran = 5000)
    val ref = batchReference(b1.map(e => (e._1, e._2, e._3)))
    assert(got == ref) // late row contributed nothing
  }
}
