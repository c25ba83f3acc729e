package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQueryListener, StreamingQueryProgress}

/** Shared measurement plumbing for the bench mains and tools — one
  * implementation of the percentile routine and the progress-collecting
  * listener (previously duplicated across Bench and SteadyStream, where a
  * fix to one copy would silently miss the others).
  */
object Metrics {

  /** Exact weighted percentile over (value, weight) samples. */
  def wPercentile(samples: Seq[(Long, Long)], p: Double): Long = {
    if (samples.isEmpty) return -1L
    val sorted = samples.sortBy(_._1)
    val total = sorted.map(_._2).sum
    val target = math.max(1L, math.ceil(total * p).toLong)
    var acc = 0L
    sorted.foreach { case (v, w) =>
      acc += w
      if (acc >= target) return v
    }
    sorted.last._1
  }

  /** Registers a listener that accumulates every real (rows > 0) trigger's
    * progress — unbounded by the recentProgress retention cap and immune
    * to idle-trigger eviction. Returns (buffer, listener); the caller
    * removes the listener via `spark.streams.removeListener` when done and
    * MUST call [[drain]] before reading the buffer after a query stops
    * (listener delivery is asynchronous — `processAllAvailable`/`stop` do
    * not wait for it).
    */
  def collectProgress(spark: SparkSession)
      : (scala.collection.mutable.ArrayBuffer[StreamingQueryProgress],
         StreamingQueryListener) = {
    val buf = new scala.collection.mutable.ArrayBuffer[StreamingQueryProgress]()
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit =
        buf.synchronized { if (e.progress.numInputRows > 0) buf += e.progress; () }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    (buf, listener)
  }

  /** Executor-side memory-pressure counters for the spill probe (VERDICT
    * r14 stretch #9): every steady measurement so far ran with generous
    * heap, so "the engines spill instead of falling over" was a design
    * claim, not a record. Accumulated from Spark's own task metrics — the
    * same numbers the UI's spill columns read — so a capped-heap ladder
    * can attribute degradation to spill volume rather than guessing. */
  final class SpillStats {
    import java.util.concurrent.atomic.AtomicLong
    val memSpilled = new AtomicLong
    val diskSpilled = new AtomicLong
    val peakTaskExecMem = new AtomicLong
    val tasks = new AtomicLong
    val tasksSpilled = new AtomicLong
    val failedTasks = new AtomicLong
    def snapshot: Map[String, Any] = Map(
      "heap_max_mb" -> Runtime.getRuntime.maxMemory / (1024 * 1024),
      "mem_spilled_mb" -> memSpilled.get / (1024 * 1024),
      "disk_spilled_mb" -> diskSpilled.get / (1024 * 1024),
      "peak_task_exec_mem_mb" -> peakTaskExecMem.get / (1024 * 1024),
      "tasks" -> tasks.get,
      "tasks_spilled" -> tasksSpilled.get,
      "failed_tasks" -> failedTasks.get)
  }

  /** Registers a SparkListener that feeds a [[SpillStats]] from task-end
    * metrics; listener delivery is async — callers snapshot after the
    * work's actions have completed (the bus drains on SparkContext.stop,
    * and these are cumulative counters, so a late event only under-counts
    * a final snapshot taken too early, never corrupts it). */
  def collectSpill(spark: SparkSession): SpillStats = {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
    val stats = new SpillStats
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        stats.tasks.incrementAndGet()
        if (!e.taskInfo.successful) { stats.failedTasks.incrementAndGet(); () }
        val m = e.taskMetrics
        if (m != null) {
          stats.memSpilled.addAndGet(m.memoryBytesSpilled)
          stats.diskSpilled.addAndGet(m.diskBytesSpilled)
          if (m.memoryBytesSpilled + m.diskBytesSpilled > 0)
            stats.tasksSpilled.incrementAndGet()
          var cur = stats.peakTaskExecMem.get
          while (m.peakExecutionMemory > cur &&
            !stats.peakTaskExecMem.compareAndSet(cur, m.peakExecutionMemory))
            cur = stats.peakTaskExecMem.get
        }
      }
    })
    stats
  }

  /** Minimal JSON serializer for the measurement tools' report maps —
    * one implementation (string escaping included) instead of a
    * hand-rolled copy per tool, where the copies had already diverged on
    * escaping. */
  def toJson(v: Any): String = v match {
    case s: String =>
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    case m: Map[_, _] =>
      m.asInstanceOf[Map[String, Any]].toSeq
        .map { case (k, x) => toJson(k) + ":" + toJson(x) }
        .mkString("{", ",", "}")
    case xs: Seq[_] => xs.map(toJson).mkString("[", ",", "]")
    // NaN/Infinity (e.g. a flatness ratio over an empty duration list)
    // are not valid JSON tokens — emit null so strict parsers (jq) accept
    // the committed reports
    case d: Double if d.isNaN || d.isInfinite => "null"
    case f: Float if f.isNaN || f.isInfinite => "null"
    case x => String.valueOf(x)
  }

  /** Parses the flat `"queries":{name:seconds,...}` map out of a bench
    * record — the ONE implementation (ADVICE r16: Bench's outlier
    * reference and ClusterBench's entry selection each carried an ad-hoc
    * scan-to-first-`}` copy, which silently returns wrong/partial entries
    * if the record format ever nests an object inside `queries`). Fails
    * loudly on nesting instead: a format change must break the caller. */
  def parseQueriesMap(txt: String): Map[String, Double] = {
    val marker = "\"queries\":{"
    val qi = txt.indexOf(marker)
    require(qi >= 0, "bench record has no \"queries\":{ map")
    val start = qi + marker.length
    val end = txt.indexOf('}', start)
    require(end >= 0, "bench record's queries map is unterminated")
    val body = txt.substring(start, end)
    require(!body.contains("{"),
      "queries map is no longer a flat name:seconds object — " +
        "update Metrics.parseQueriesMap before trusting any parse of it")
    "\"([^\"]+)\":(-?[0-9.eE+]+)".r.findAllMatchIn(body)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
  }

  /** Waits until the buffer's size has been stable for `quietPolls`
    * consecutive 100 ms polls — the listener bus delivers asynchronously,
    * so tail progress events can land AFTER the query stops; reading
    * without draining silently drops the last triggers' records. */
  def drain(buf: scala.collection.mutable.ArrayBuffer[_],
            quietPolls: Int = 3): Unit = {
    var last = -1
    var same = 0
    while (same < quietPolls) {
      val s = buf.synchronized(buf.size)
      if (s == last) same += 1 else { same = 0; last = s }
      Thread.sleep(100)
    }
  }
}
