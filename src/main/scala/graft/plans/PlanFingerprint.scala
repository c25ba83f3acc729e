package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.aggregate.{Partial, PartialMerge}
import org.apache.spark.sql.execution.{FileSourceScanExec, GenerateExec, SortExec, SparkPlan, TakeOrderedAndProjectExec, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{BaseJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}

/** Structural fingerprint of a physical plan — the scale-relevant facts
  * the value-level oracle cannot see: how many shuffles, which join
  * strategies, whether predicates reached the scan, whether the scan is
  * partition-pruned and column-pruned, how wide the codegen spans are.
  * `PLANS.json` pins one fingerprint per catalog entry; `PlanLedgerSpec`
  * recomputes them at HEAD and fails on any unexplained drift (an extra
  * exchange, a broadcast flipping to a sort-merge join, a lost pushdown
  * — regressions a green oracle run would sail straight past).
  *
  * Determinism: the fingerprint reads the pre-execution plan (under AQE,
  * `AdaptiveSparkPlanExec`'s initial plan). Runtime AQE re-planning is
  * deliberately NOT pinned — it depends on observed sizes, which the
  * ledger cannot hold fixed across driver testdata regenerations. What
  * IS pinned is everything the code decides: hinted broadcasts, join
  * selection, exchange placement, pushdown, pruning, codegen breadth.
  * Literal values inside pushed filters are blanked (`#`) so
  * data-derived constants cannot invalidate the ledger when the driver
  * regenerates testdata at the same scale.
  */
object PlanFingerprint {

  /** SQL confs a fingerprint run pins (the plan-affecting ones the
    * shipped session sets — see [[graft.GraftSession.builder]]); saved
    * and restored around the sweep so a shared test session is not
    * perturbed.
    */
  val PinnedConf: Map[String, String] = Map(
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
    "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "8388608",
    "spark.sql.codegen.maxFields" -> "256",
    "spark.sql.session.timeZone" -> "UTC")

  def withPinnedConf[A](spark: SparkSession)(body: => A): A = {
    val saved = PinnedConf.keys.map(k =>
      k -> spark.conf.getOption(k)).toMap
    PinnedConf.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  /** One fingerprint: field order is FIXED (it is the ledger's on-disk
    * order); every value is already rendered as a JSON fragment.
    */
  def fields(df: DataFrame): Seq[(String, String)] =
    fieldsOf(df.queryExecution.executedPlan)

  private case class Acc(
    var exchanges: Int = 0, var reusedExchanges: Int = 0,
    var broadcasts: Int = 0,
    val joins: scala.collection.mutable.ArrayBuffer[String] =
      scala.collection.mutable.ArrayBuffer(),
    var aggregates: Int = 0, var partialAgg: Boolean = false,
    var windowGroupLimits: Int = 0, var takeOrdered: Int = 0,
    var sorts: Int = 0, var windows: Int = 0, var generates: Int = 0,
    var cachedReads: Int = 0, var codegenSpans: Int = 0,
    val scans: scala.collection.mutable.ArrayBuffer[String] =
      scala.collection.mutable.ArrayBuffer())

  /** Blank literal digit runs so data-derived constants (a collected
    * threshold, a regenerated date) cannot invalidate the ledger. */
  private def blank(s: String): String = s.replaceAll("[0-9]+", "#")

  private def scanLine(f: FileSourceScanExec): String = {
    val table = blank(
      f.relation.location.rootPaths.headOption.map(_.getName).getOrElse("?"))
    val pushed = blank(f.metadata.getOrElse("PushedFilters", "[]"))
    s"$table cols=${f.requiredSchema.size} pushed=$pushed " +
      s"part=${f.partitionFilters.nonEmpty}"
  }

  private def fieldsOf(root: SparkPlan): Seq[(String, String)] = {
    val acc = Acc()
    def walk(n: SparkPlan): Unit = {
      n match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan); return
        case _: InMemoryTableScanExec => acc.cachedReads += 1; return
        case _: ShuffleExchangeExec   => acc.exchanges += 1
        case _: ReusedExchangeExec    => acc.reusedExchanges += 1
        case _: BroadcastExchangeExec => acc.broadcasts += 1
        case _: CartesianProductExec  => acc.joins += "CartesianProduct"
        case j: BaseJoinExec =>
          acc.joins += s"${j.nodeName}:${j.joinType}"
        case a: BaseAggregateExec =>
          acc.aggregates += 1
          if (a.aggregateExpressions.exists(e =>
              e.mode == Partial || e.mode == PartialMerge))
            acc.partialAgg = true
        case _: WindowGroupLimitExec       => acc.windowGroupLimits += 1
        case _: TakeOrderedAndProjectExec  => acc.takeOrdered += 1
        case _: SortExec                   => acc.sorts += 1
        case _: WindowExec                 => acc.windows += 1
        case _: GenerateExec               => acc.generates += 1
        case f: FileSourceScanExec         => acc.scans += scanLine(f)
        case _                             => ()
      }
      n.children.foreach(walk)
      n.subqueries.foreach(walk)
    }
    // codegen breadth: under AQE the pre-execution plan has no
    // WholeStageCodegen wrappers yet (they are inserted per stage at
    // execution prep), so apply the same collapse rule execution would
    // and count the spans it produces — a narrowing span count means an
    // expression fell out of codegen (an interpreted eval in the hot path)
    def codegenSpansOf(p: SparkPlan): Int = {
      def unwrap(n: SparkPlan): SparkPlan = n match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case other                    => other
      }
      def count(n: SparkPlan): Int =
        (n match { case _: WholeStageCodegenExec => 1; case _ => 0 }) +
          n.children.map(c => count(unwrap(c))).sum
      try count(org.apache.spark.sql.execution.CollapseCodegenStages(
        new java.util.concurrent.atomic.AtomicInteger(0)).apply(unwrap(p)))
      catch { case _: Throwable => -1 }
    }
    walk(root)
    acc.codegenSpans = codegenSpansOf(root)
    def jStr(s: String): String =
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    def jArr(xs: Seq[String]): String = xs.map(jStr).mkString("[", ",", "]")
    Seq(
      "exchanges" -> acc.exchanges.toString,
      "reused_exchanges" -> acc.reusedExchanges.toString,
      "broadcasts" -> acc.broadcasts.toString,
      "joins" -> jArr(acc.joins.toSeq),
      "aggregates" -> acc.aggregates.toString,
      "partial_agg" -> acc.partialAgg.toString,
      "window_group_limits" -> acc.windowGroupLimits.toString,
      "take_ordered" -> acc.takeOrdered.toString,
      "sorts" -> acc.sorts.toString,
      "windows" -> acc.windows.toString,
      "generates" -> acc.generates.toString,
      "cached_reads" -> acc.cachedReads.toString,
      "codegen_spans" -> acc.codegenSpans.toString,
      // scans sorted: map-side scan order can differ between logically
      // identical plans (join-side enumeration), and the ledger should
      // not churn on it
      "scans" -> jArr(acc.scans.toSeq.sorted))
  }

  /** Canonical one-line JSON object for one entry. */
  def canonicalJson(df: DataFrame): String =
    fields(df).map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
}
