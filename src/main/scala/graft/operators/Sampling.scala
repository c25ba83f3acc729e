package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * Class rebalancing ("keep 5% of boilerplate views, all purchases") must
  * be REPRODUCIBLE across runs, engines, and retries — `rand()`-based
  * sampling is none of those, and at 100 TB a re-run that samples
  * different rows invalidates every downstream cache and ablation.
  * Sampling here is a pure per-row predicate on an engine-portable
  * md5-prefix hash of the row id ([[Dedup.hash31]]): fully parallel, no
  * shuffle, no state, codegen'd, and replayable row-for-row by the
  * driver's DuckDB oracle (and any other engine with md5).
  */
object Sampling {

  /** Keeps each row with probability `pctByStratum(stratum) / 100`
    * (default `defaultPct`), decided by the row's own id hash:
    * `hash31(id) % 100 < pct`. Same id + same rates => same decision,
    * everywhere, forever.
    */
  /** The per-row sampling percentage as a column — ONE definition shared
    * by the predicate and the weights, so they cannot disagree. */
  private def pctColumn(strataCol: String, pctByStratum: Map[String, Int],
                        defaultPct: Int): Column = {
    require((pctByStratum.values ++ Seq(defaultPct)).forall(p => p >= 0 && p <= 100),
      "sampling percentages must be in [0, 100]")
    pctByStratum.foldLeft(lit(defaultPct)) { case (acc, (stratum, p)) =>
      when(col(strataCol) === stratum, lit(p)).otherwise(acc)
    }
  }

  def stratifiedSample(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      pctByStratum: Map[String, Int],
      defaultPct: Int = 100): DataFrame = {
    val slot: Column = Dedup.hash31(col(idCol).cast("string")) % 100
    df.where(slot < pctColumn(strataCol, pctByStratum, defaultPct))
  }

  /** [[stratifiedSample]] plus an inverse-probability `weight` column
    * (100/pct), so downstream aggregates stay unbiased estimates of the
    * full-data values (Horvitz–Thompson). */
  def stratifiedSampleWeighted(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      pctByStratum: Map[String, Int],
      defaultPct: Int = 100): DataFrame =
    stratifiedSample(df, idCol, strataCol, pctByStratum, defaultPct)
      .withColumn("weight",
        lit(100.0) / pctColumn(strataCol, pctByStratum, defaultPct).cast("double"))
}
