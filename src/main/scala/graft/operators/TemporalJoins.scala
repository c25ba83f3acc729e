package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins for point-in-time-correct feature pipelines.
  *
  * The reference's join operator is an equi-join shell
  * (src/runtime/operators/join/join_operator.rs — pass-through;
  * join_function.rs:14-18 Unimplemented), but every feature-store
  * backfill needs the two temporal shapes Spark has no native operator
  * for: the AS-OF join (each fact row picks the latest dimension row at
  * or before its timestamp — training-set point-in-time correctness) and
  * the bounded INTERVAL join (each fact row pairs with the other
  * stream's rows inside a relative time range — Flink's interval join).
  * Both are built here from shuffle-friendly primitives so the naive
  * O(n×m) plans (per-row subquery / BroadcastNestedLoopJoin) never
  * appear:
  *
  *  - [[asofJoin]] — union-tag both sides, ONE hash shuffle per side on
  *    the key columns, one sort, one running `last(..., ignoreNulls)`
  *    window pass. No row explosion, no probe amplification; identical
  *    shuffle shape to a sort-merge join, so it survives 100 TB exactly
  *    as well as SMJ does. A hot key serializes its partition (the same
  *    caveat any keyed window has) — salt upstream if one key dominates.
  *  - [[rangeJoin]] — bucketize event time at the range's width: the
  *    right side lands in exactly one bucket, the left side explodes to
  *    the ~2 buckets covering its window, and the pair meets in an
  *    equi-join on (keys, bucket) followed by the exact range filter.
  *    Shuffles are plain hash exchanges on (keys, bucket) — bucketing
  *    also DILUTES key skew, since a hot key spreads over its time
  *    buckets. Each qualifying pair is produced exactly once (the pair
  *    meets only in the right row's own bucket).
  */
object TemporalJoins {

  /** Floor-division bucket id, exact at any BIGINT magnitude (epoch-ns
    * included — a plain double divide loses exactness past 2^53):
    * (x - pmod(x, w)) is the floored multiple (pmod's remainder is
    * non-negative even for negative x), divided exactly in decimal. */
  private def floorDivBucket(x: Column, widthMs: Long): Column =
    ((x - pmod(x, lit(widthMs))).cast("decimal(38,0)") / lit(widthMs)).cast("long")

  /** Point-in-time (as-of) LEFT join.
    *
    * For each left row, attaches `rightCols` from the single right row
    * with the same `keyCols` and the greatest right timestamp that is
    *  - `<=` the left timestamp (direction = "backward", the default;
    *    `<` when `allowExactMatch = false`), or
    *  - the smallest right timestamp `>=` / `>` it (direction = "forward").
    *
    * Unmatched left rows keep NULLs. With `toleranceMs`, a match farther
    * than the tolerance from the left timestamp is nulled out (the row
    * stays — LEFT semantics). Ties (several right rows sharing one
    * (key, ts)) resolve deterministically to the largest payload tuple.
    *
    * Output: every left column, plus `rightPrefix + rightTsCol` (the
    * matched right timestamp, BIGINT) and `rightPrefix + c` for each
    * requested right column.
    *
    * Timestamps are compared as BIGINT (cast from the named columns);
    * pass epoch-ms columns for event time.
    *
    * NULL keys: window partitioning groups nulls together, so null-keyed
    * left rows CAN match null-keyed right rows — unlike SQL equality
    * joins (DuckDB ASOF never matches null keys). Filter null keys from
    * either side first if SQL semantics are required.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTsCol: String,
      rightTsCol: String,
      rightCols: Seq[String],
      rightPrefix: String = "r_",
      toleranceMs: Option[Long] = None,
      allowExactMatch: Boolean = true,
      direction: String = "backward"): DataFrame = {
    require(keyCols.nonEmpty, "asofJoin needs at least one key column")
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    toleranceMs.foreach(t => require(t >= 0, "toleranceMs must be >= 0"))
    val fwd = direction == "forward"

    // Forward direction reuses the backward machinery on negated time.
    def ordered(ts: Column): Column = {
      val t = ts.cast("long")
      if (fwd) -t else t
    }

    // Right payload: matched ts first (needed for tolerance + output),
    // then the requested columns — also the deterministic tie-break, as
    // the running `last` under an ascending (__ts, __side, __rv) sort
    // leaves the largest payload tuple in effect for equal timestamps.
    val payload = struct(
      col(rightTsCol).cast("long").as("__rts") +: rightCols.map(col): _*)
    val payloadType = right.select(payload.as("__rv")).schema("__rv").dataType

    // Sort order at equal timestamps decides <= vs <: the right row must
    // come BEFORE the left row to be visible to it.
    val (sideR, sideL) = if (allowExactMatch) (0, 1) else (1, 0)

    val l2 = left
      .withColumn("__ts", ordered(col(leftTsCol)))
      .withColumn("__side", lit(sideL))
      .withColumn("__rv", lit(null).cast(payloadType))
    val r2 = right.select(
      keyCols.map(col) ++ Seq(
        ordered(col(rightTsCol)).as("__ts"),
        lit(sideR).as("__side"),
        payload.as("__rv")): _*)

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc, col("__rv").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = l2.unionByName(r2, allowMissingColumns = true)
      .withColumn("__m", last(col("__rv"), ignoreNulls = true).over(w))
      .where(col("__side") === sideL)

    val gap = abs(col(leftTsCol).cast("long") - col("__m").getField("__rts"))
    val withinTol = toleranceMs match {
      case Some(t) => when(gap <= t, col("__m"))
      case None    => col("__m")
    }
    val outCols =
      left.columns.map(col).toSeq ++
        (withinTol.getField("__rts").as(rightPrefix + rightTsCol) +:
          rightCols.map(c => withinTol.getField(c).as(rightPrefix + c)))
    matched.select(outCols: _*)
  }

  /** Bounded interval (range) INNER join: pairs each left row with every
    * right row sharing `keyCols` whose timestamp lies in
    * `[leftTs + lowerMs, leftTs + upperMs]` (bounds inclusive; negative
    * bounds look back).
    *
    * Output: every left column, plus `rightPrefix + rightTsCol` and
    * `rightPrefix + c` for each requested right column.
    *
    * `bucketMs` overrides the bucket width (default: the range span), a
    * knob for mismatched densities — smaller buckets explode the left
    * side into more candidates but tighten the pre-filter join.
    */
  def rangeJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTsCol: String,
      rightTsCol: String,
      lowerMs: Long,
      upperMs: Long,
      rightCols: Seq[String],
      rightPrefix: String = "r_",
      bucketMs: Long = 0L): DataFrame = {
    require(keyCols.nonEmpty, "rangeJoin needs at least one key column")
    require(upperMs >= lowerMs, s"empty range: [$lowerMs, $upperMs]")
    val width = if (bucketMs > 0) bucketMs else math.max(1L, upperMs - lowerMs)
    // alignment-safe bound: floor((lts+upper)/w) - floor((lts+lower)/w) + 1
    // can exceed span/w + 1 by one bucket depending on where lts falls
    val explosion = (upperMs - lowerMs) / width + 2
    require(explosion <= 4096,
      s"bucketMs=$width explodes each left row into up to $explosion candidate buckets " +
        "over a " + (upperMs - lowerMs) + " ms range — widen the bucket")

    val lts = col(leftTsCol).cast("long")
    val l2 = left.withColumn(
      "__bucket",
      explode(sequence(
        floorDivBucket(lts + lit(lowerMs), width),
        floorDivBucket(lts + lit(upperMs), width))))

    val rts = col(rightTsCol).cast("long")
    val r2 = right.select(
      keyCols.map(col) ++
        (rts.as(rightPrefix + rightTsCol) +:
          rightCols.map(c => col(c).as(rightPrefix + c))): _*)
      .withColumn("__bucket", floorDivBucket(col(rightPrefix + rightTsCol), width))

    val matchedRts = col(rightPrefix + rightTsCol)
    l2.join(r2, keyCols :+ "__bucket")
      .where(matchedRts.between(lts + lit(lowerMs), lts + lit(upperMs)))
      .drop("__bucket")
  }
}
