package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators for scan pruning at rest.
  *
  * At 100 TB the fastest scan is the one that never reads the file:
  * parquet row-group/file min-max statistics prune a predicate only if
  * rows with nearby values sit in the same files. A plain sort clusters
  * ONE column; Z-ORDERING interleaves the bits of several columns into a
  * single sort key, so a range box on ANY subset of the z-columns maps
  * to a bounded set of files (the Delta/Iceberg OPTIMIZE ZORDER shape,
  * from public Morton-code literature).
  *
  * [[zvalue]] is a pure deterministic expression (rank each column to a
  * bounded integer via proportional min-max scaling, then interleave
  * bits), so it is engine-portable and testable; [[zorderBy]] applies it
  * as repartitionByRange + sortWithinPartitions — one range shuffle, the
  * same cost as a global sort, paid once at write time.
  */
object Layout {

  /** Morton (Z-curve) interleaving of `cols`, each min-max scaled to
    * `bits` bits. Scaling bounds come from the caller (computed once via
    * an agg, or known domain bounds) — keeping the expression pure.
    *
    * @param cols    (column, min, max) triples; max > min.
    * @param bits    bits per column; cols.size * bits <= 63.
    */
  def zvalue(cols: Seq[(Column, Long, Long)], bits: Int = 16): Column = {
    require(cols.nonEmpty, "zvalue needs at least one column")
    require(cols.size * bits <= 63, s"${cols.size} cols x $bits bits exceeds a long")
    val maxCell = (1L << bits) - 1
    // scale to [0, 2^bits): (v - min) * maxCell / (max - min), clamped
    val scaled = cols.map { case (c, mn, mx) =>
      require(mx > mn, s"degenerate z-column bounds [$mn, $mx]")
      require(mx - mn <= Long.MaxValue / maxCell,
        s"z-column span ${mx - mn} x $maxCell overflows the scaling multiply " +
          "— pre-bucket the column (e.g. ns -> ms) before z-ordering")
      val s = ((c.cast("long") - lit(mn)) * lit(maxCell) / lit(mx - mn)).cast("long")
      least(greatest(s, lit(0L)), lit(maxCell))
    }
    // interleave: output bit (b * nCols + i) = bit b of column i
    val n = cols.size
    val terms = for {
      b <- 0 until bits
      i <- 0 until n
    } yield shiftleft(
      shiftright(scaled(i), b).bitwiseAND(lit(1L)), b * n + i)
    terms.reduce((a, x) => a.bitwiseOR(x))
  }

  /** Rewrites `df` into `numFiles` output slices clustered by the
    * z-value of `colsWithBounds` — write the result with
    * `.write.parquet(...)` and range predicates on any z-column prune at
    * file granularity. One range shuffle (sampled boundaries), then an
    * in-partition sort; nothing else moves.
    */
  def zorderBy(df: DataFrame, colsWithBounds: Seq[(String, Long, Long)],
               numFiles: Int, bits: Int = 16): DataFrame = {
    val z = zvalue(colsWithBounds.map { case (name, mn, mx) => (col(name), mn, mx) }, bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
