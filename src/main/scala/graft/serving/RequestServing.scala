package graft.serving

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.streaming.SlidingWindows.{AggSpec, RangeMs, RowsN}

/** Point-in-time window evaluation at a virtual timestamp — the batch
  * rendition of the reference's WindowRequestOperator, which evaluates
  * each window aggregate for a key *at request time* against buffered
  * state (src/runtime/operators/window/window_request_operator.rs:90-300;
  * points aggregations in aggregates/plain_points.rs and
  * retractable_points.rs: the request ts is a virtual point, the frame is
  * the window ending at that point).
  *
  * The plan is the 1000-executor shape: one filtered scan, at most one
  * hash shuffle on the key. RANGE frames become conditional aggregates
  * over `ts in (at - len, at]`; ROWS frames rank each key's rows by
  * recency first (`row_number` over the same hash partitioning the final
  * aggregate reuses) and aggregate the top n+1. Keys with no row in any
  * frame produce no output row, matching the reference's empty-batch
  * response for unknown keys (window_request_operator.rs:158-161).
  */
object RequestServing {

  /** @param atTs the virtual point (event-time ms): features as of `atTs`.
    * @return one row per key: keyCol + one column per spec.
    *         sum/min/max preserve the value column's type, count is LONG,
    *         avg is DOUBLE (sum/count — exact when values are integers).
    */
  def pointInTime(df: DataFrame, keyCol: String, tsMsCol: String,
                  valueCol: String, specs: Seq[AggSpec], atTs: Long): DataFrame = {
    val ts = col(tsMsCol)
    val v = col(valueCol)
    val hasRows = specs.exists(_.frame.isInstanceOf[RowsN])
    val maxRange = specs.map(_.frame).collect { case RangeMs(l) => l }
      .foldLeft(0L)(math.max)

    // Rows at/before the virtual point; when every frame is a RANGE the
    // scan is also bounded below (filter reaches the parquet scan).
    var base = df.where(ts <= atTs)
    if (!hasRows) base = base.where(ts > atTs - maxRange)
    // Recency rank per key, only when some ROWS frame needs it.
    val ranked =
      if (hasRows)
        base.withColumn("__rn",
          row_number().over(Window.partitionBy(col(keyCol)).orderBy(ts.desc)))
      else base

    def frameCond(frame: graft.streaming.SlidingWindows.Frame): Column = frame match {
      case RangeMs(len) => ts > atTs - len // upper bound already applied
      case RowsN(n)     => col("__rn") <= n + 1
    }

    val aggs = specs.map { s =>
      val masked = when(frameCond(s.frame), v)
      (s.kind match {
        case "sum"   => sum(masked)
        case "count" => count(masked)
        case "avg"   => sum(masked).cast("double") / count(masked)
        case "min"   => min(masked)
        case "max"   => max(masked)
        case other   => throw new IllegalArgumentException(
          s"pointInTime supports sum/count/avg/min/max, got $other")
      }).as(s.name)
    }
    ranked.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
  }
}
