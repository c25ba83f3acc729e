package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, timestamp_millis, window => fwindow, sum => fsum}
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** The idle-source scenario the reference's watermark idle-timeout solves
  * (watermark/manager.rs:29-75): a source emits some rows then goes
  * quiet; without help, Spark's watermark freezes at the last event time
  * and the open window's state never emits. [[Keepalive.withHeartbeat]]
  * must unstick it within a heartbeat interval + trigger.
  */
class KeepaliveSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Run a 10 s tumbling-window agg over a source that emits 5 rows
    * (two windows' worth) then goes idle; return rows observed within
    * the deadline. Event times are wall-clock-anchored so heartbeat
    * times (wall clock) are AHEAD of the data — the idle-unstick case.
    */
  private def runIdle(heartbeat: Boolean, want: Long, deadlineMs: Long,
                      graceMs: Long = 0L): Long = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = (System.currentTimeMillis() / 10000) * 10000 - 60000
    val mem = MemoryStream[(Long, String, Double)]
    val data = mem.toDF().toDF("ts_ms", "key", "value")
    val src = if (heartbeat) Keepalive.withHeartbeat(data, "ts_ms", 100)
              else data.withColumn(Keepalive.HB, org.apache.spark.sql.functions.lit(false))
    val out = Keepalive.dropHeartbeats(
        src.withColumn("__wm", timestamp_millis(col("ts_ms")))
          .withWatermark("__wm", "0 milliseconds"), "__wm")
      .groupBy(col("key"), fwindow(col("__wm"), "10 seconds"))
      .agg(fsum("value").as("s"))
    val qname = s"ka_${heartbeat}_${System.nanoTime()}"
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName(qname).trigger(Trigger.ProcessingTime(50)).start()
    try {
      mem.addData(
        (base, "k", 1.0), (base + 1000, "k", 2.0), (base + 2000, "k", 3.0),
        (base + 10000, "k", 4.0), (base + 11000, "k", 5.0))
      // ...and then the source goes idle: no more addData, no flush row.
      // poll until the EXPECTED count lands (deadline generous: the box
      // is shared and a micro-batch can take seconds under load), then
      // hold a grace period to catch over-emission
      val deadline = System.currentTimeMillis() + deadlineMs
      var n = 0L
      while (n < want && System.currentTimeMillis() < deadline) {
        Thread.sleep(100)
        n = spark.table(qname).count()
      }
      if (graceMs > 0) { Thread.sleep(graceMs); n = spark.table(qname).count() }
      n
    } finally q.stop()
  }

  test("pipeline spec keepalive_ms: idle source's append windows emit, schema unchanged") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = (System.currentTimeMillis() / 10000) * 10000 - 60000
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val spec = """{
      "execution_mode": "Streaming",
      "sources": [ { "table_name": "ka_evt", "source": { "Memory": {} },
                     "event_time_column": "ts", "keepalive_ms": 100 } ],
      "sql": "SELECT key, window(ts, '10 seconds').start AS ws, sum(value) AS s FROM ka_evt GROUP BY key, window(ts, '10 seconds')",
      "sink": { "Memory": {"table_name": "ka_out"} }
    }"""
    val handle = graft.api.Pipeline.runJson(spark, spec,
      tables = Map("ka_evt" -> mem.toDF().toDF("ts", "key", "value")))
    try {
      mem.addData(
        (new java.sql.Timestamp(base), "k", 1.0),
        (new java.sql.Timestamp(base + 1000), "k", 2.0),
        (new java.sql.Timestamp(base + 10000), "k", 4.0))
      // source goes idle; no flush rows — only heartbeats advance the clock
      val deadline = System.currentTimeMillis() + 15000
      var n = 0L
      while (n < 2 && System.currentTimeMillis() < deadline) {
        Thread.sleep(200)
        n = spark.table("ka_out").count()
      }
      assert(n == 2L, "keepalive_ms did not close the idle source's windows via the spec path")
      // the marker column must not leak into the declared output schema
      assert(spark.table("ka_out").columns.toSet == Set("key", "ws", "s"))
    } finally handle.stop()
  }

  test("idle source: append windows hang without keepalive, emit with it") {
    // without heartbeats the watermark freezes at the last event time
    // (base+11s): window 1 (end base+10s) closes off the data itself, but
    // window 2 (end base+20s) hangs forever — the idle-source stall.
    // Poll until window 1 lands (generous deadline: shared box), then
    // hold 2 s to confirm window 2 stays open.
    assert(runIdle(heartbeat = false, want = 1, deadlineMs = 20000,
        graceMs = 2000) == 1L,
      "expected exactly the first window without a watermark advance")
    // with heartbeats, wall clock is ahead of both window ends, so both
    // windows close within a heartbeat + trigger
    assert(runIdle(heartbeat = true, want = 2, deadlineMs = 20000) == 2L,
      "keepalive did not close the idle source's windows")
  }
}
