package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit, unix_millis}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Idle-source watermark keepalive — the port of the reference's
  * idle-upstream exclusion (src/runtime/watermark/manager.rs:29-75: an
  * upstream that stays silent past a timeout is dropped from the
  * watermark min-merge so downstream windows keep closing). Spark's
  * watermark manager has no per-source timeout hook, and a source that
  * goes quiet freezes its branch's event-time high-water mark — pending
  * window state hangs until the source speaks again (or forever).
  *
  * The producer-side rendition: union the branch with a rate-source
  * heartbeat BEFORE watermark assignment. Heartbeats carry wall-clock
  * event time in `tsMsCol`, NULL in every data column, and `__hb = true`;
  * the caller applies `withWatermark` on the union, then drops heartbeats
  * with `filter(!col("__hb"))` — the EventTimeWatermark node has already
  * seen their event times by then, so the watermark advances with wall
  * clock while no synthetic row ever reaches a window. Same contract as
  * the reference's timeout (windows close within ~intervalMs + trigger of
  * the source going idle); same caveat as its timeout and as
  * multipleWatermarkPolicy=max: data arriving LATER than the heartbeat
  * lead is late and subject to the lateness allowance.
  *
  * Scale posture: the heartbeat is a handful of rows per second from the
  * driver-side rate source, unioned before any shuffle — cost is
  * epsilon; one heartbeat per watermarked branch (not per partition),
  * matching Spark's per-query (not per-partition) watermark granularity.
  */
object Keepalive {

  /** Marker column added to `data` (false) and heartbeat rows (true). */
  val HB: String = "__hb"

  /** Union `data` with heartbeat rows every ~`intervalMs`, marking both
    * sides with [[HB]]. Apply `withWatermark` AFTER this, then drop
    * marked rows once the watermark node has them.
    */
  def withHeartbeat(data: DataFrame, tsCol: String, intervalMs: Long): DataFrame = {
    require(intervalMs > 0, s"intervalMs must be positive: $intervalMs")
    val spark = data.sparkSession
    // event time in the DATA's own representation: epoch ms for BIGINT
    // columns (the engine contract), the rate timestamp itself for
    // timestamp-typed columns — a naive cast of an epoch-ms long to
    // TIMESTAMP would re-interpret it as SECONDS
    val tsExpr = data.schema(tsCol).dataType match {
      case LongType => unix_millis(col("timestamp"))
      case TimestampType => col("timestamp")
      case TimestampNTZType => col("timestamp").cast(TimestampNTZType)
      case other => throw new IllegalArgumentException(
        s"keepalive event-time column $tsCol has unsupported type $other")
    }
    val hb = spark.readStream.format("rate")
      .option("rowsPerSecond", math.max(1L, 1000L / intervalMs).toString)
      .load()
      .select(tsExpr.as(tsCol))
    val padded = hb.select(data.schema.fields.map { f =>
      if (f.name == tsCol) col(tsCol).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }.toIndexedSeq: _*).withColumn(HB, lit(true))
    data.withColumn(HB, lit(false)).unionByName(padded)
  }

  /** Drop heartbeat rows AFTER `withWatermark` — and keep them dropped
    * there. A plain `filter(!col(HB))` gets optimizer-pushed below the
    * EventTimeWatermark node (PushPredicateThroughNonJoin allows any
    * predicate not referencing the event-time attribute through), which
    * silently removes the heartbeats before the watermark node ever sees
    * their event times — the whole mechanism no-ops. Referencing the
    * event-time column in the predicate (a vacuous IS NULL arm) pins the
    * filter above the node.
    */
  def dropHeartbeats(df: DataFrame, eventTimeCol: String): DataFrame =
    df.filter(!col(HB) || col(eventTimeCol).isNull)
}
