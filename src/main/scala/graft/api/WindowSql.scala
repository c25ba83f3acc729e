package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction, UnresolvedRelation, UnresolvedStar}
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, CurrentRow, Expression, Literal, RangeFrame, RowFrame, SortOrder, SpecifiedWindowFrame, UnaryMinus, UnresolvedWindowExpression, WindowExpression, WindowSpecDefinition, WindowSpecReference}
import org.apache.spark.sql.catalyst.plans.logical.{Project, WithWindowDefinition}
import org.apache.spark.sql.functions.col

import graft.streaming.SlidingWindows
import graft.streaming.SlidingWindows.{AggSpec, Frame, RangeMs, RowsN}

/** SQL OVER-window compiler for the streaming engine — the reference's
  * production path: SQL goes in, the planner splits PARTITION BY into a
  * KeyBy and the window expressions into the WindowOperator
  * (src/api/planner.rs:390-432). Spark's own streaming runner rejects
  * per-row OVER windows, so this compiler parses the query, extracts the
  * window specs, and routes them through [[SlidingWindows.streaming]] —
  * the SAME SQL then runs in batch mode via Catalyst and in streaming
  * mode via the engine, with identical results.
  *
  * Supported shape (the reference's window contract, SURVEY §2.6: one
  * PARTITION BY key, ORDER BY one ms timestamp column, frames
  * `RANGE/ROWS ... PRECEDING AND CURRENT ROW`):
  *
  * {{{
  * SELECT <key>, <ts>, [<value>, <cate>,]
  *        agg(<value>) OVER w AS alias, ...       -- sum/count/avg/min/max,
  *        count(*) OVER w AS alias,               -- stddev/var family,
  *        top(<value>, n) OVER w AS alias,        -- top family,
  *        sum_cate(<value>, <cate>) OVER w AS a   -- cate family
  * FROM <table>
  * WINDOW w AS (PARTITION BY <key> ORDER BY <ts>
  *              RANGE BETWEEN <ms> PRECEDING AND CURRENT ROW)
  * }}}
  *
  * All aggregates must share one numeric value column (plus at most one
  * category column); that is the engine's state-row shape.
  */
object WindowSql {

  final case class Compiled(
      table: String,
      keyCol: String,
      tsCol: String,
      valueCol: Option[String],
      cateCol: Option[String],
      specs: Seq[AggSpec],
      /** Output columns in SELECT order (pass-through cols + aliases). */
      outCols: Seq[String]) {

    /** Run the compiled windows over a (streaming or batch) frame of the
      * source table through the engine. */
    def run(src: DataFrame, latenessMs: Long = 0,
            tileGranularityMs: Long = 60000L, useBatchSweep: Boolean = false): DataFrame = {
      val vc = valueCol.getOrElse(tsCol) // count(*)-only queries: any numeric
      val out =
        if (useBatchSweep)
          SlidingWindows.batchCompute(src, keyCol, tsCol, vc, specs,
            tileGranularityMs, cateCol.orNull)
        else
          SlidingWindows.streaming(src, keyCol, tsCol, vc, specs, latenessMs,
            tileGranularityMs, cateCol.orNull)
      // engine emits (ts_ms, key, value[, cate], <specs>): rename back
      var renamed = out.withColumnRenamed("ts_ms", tsCol).withColumnRenamed("key", keyCol)
      renamed = valueCol.map(v => renamed.withColumnRenamed("value", v))
        .getOrElse(renamed)
      renamed = cateCol.map(c => renamed.withColumnRenamed("cate", c)).getOrElse(renamed)
      renamed.select(outCols.map(col): _*)
    }
  }

  private val kinds = Set("sum", "count", "avg", "min", "max",
    "stddev", "stddev_pop", "stddev_samp", "var_pop", "var_samp", "variance",
    "top", "topn_frequency", "top1_ratio") ++
    Seq("sum", "avg", "count", "min", "max").map(_ + "_cate")

  /** Compile, or explain why the query doesn't fit the engine shape. */
  def compile(spark: SparkSession, sql: String): Either[String, Compiled] = {
    val parsed = spark.sessionState.sqlParser.parsePlan(sql)
    val (projectList, windowDefs, table) = parsed match {
      case WithWindowDefinition(defs, Project(pl, UnresolvedRelation(parts, _, _)), _) =>
        (pl, defs, parts.mkString("."))
      case Project(pl, WithWindowDefinition(defs, UnresolvedRelation(parts, _, _), _)) =>
        (pl, defs, parts.mkString("."))
      case Project(pl, UnresolvedRelation(parts, _, _)) =>
        (pl, Map.empty[String, WindowSpecDefinition], parts.mkString("."))
      case other => return Left(s"unsupported plan shape: ${other.getClass.getSimpleName}")
    }

    var keyCol: String = null; var tsCol: String = null
    var valueCol: Option[String] = None; var cateCol: Option[String] = None
    val specs = Seq.newBuilder[AggSpec]
    val outCols = Seq.newBuilder[String]

    def attr(e: Expression, what: String): Either[String, String] = e match {
      case a: UnresolvedAttribute => Right(a.nameParts.last)
      case other => Left(s"$what must be a column, got $other")
    }
    def foldLong(e: Expression, what: String): Either[String, Long] = e match {
      case Literal(v: Number, _) => Right(v.longValue())
      case UnaryMinus(Literal(v: Number, _), _) => Right(-v.longValue())
      case other => Left(s"$what must be a literal, got $other")
    }
    def setShared(cur: String, nw: String, what: String): Either[String, String] =
      if (cur == null || cur == nw) Right(nw)
      else Left(s"all windows must share one $what column ($cur vs $nw)")

    def frameOf(spec: WindowSpecDefinition): Either[String, Frame] = spec.frameSpecification match {
      case SpecifiedWindowFrame(RangeFrame, lower, CurrentRow) =>
        foldLong(lower, "RANGE lower bound").map(l => RangeMs(-l))
      case SpecifiedWindowFrame(RowFrame, lower, CurrentRow) =>
        foldLong(lower, "ROWS lower bound").map(l => RowsN((-l).toInt))
      case other => Left(s"unsupported frame $other (need ... PRECEDING AND CURRENT ROW)")
    }

    def handleWindow(fn: UnresolvedFunction, spec: WindowSpecDefinition,
                     alias: String): Either[String, Unit] = {
      // partition / order consistency
      for {
        k <- spec.partitionSpec match {
          case Seq(p) => attr(p, "PARTITION BY")
          case _ => Left("exactly one PARTITION BY column required")
        }
        _ <- setShared(keyCol, k, "partition").map(keyCol = _)
        t <- spec.orderSpec match {
          case Seq(SortOrder(o, Ascending, _, _)) => attr(o, "ORDER BY")
          case _ => Left("exactly one ascending ORDER BY column required")
        }
        _ <- setShared(tsCol, t, "order").map(tsCol = _)
        frame <- frameOf(spec)
        _ <- {
          val name = fn.nameParts.last.toLowerCase
          if (!kinds(name)) Left(s"unsupported window function $name")
          else {
            val args = fn.arguments
            // count(*) parses as a star (or, defensively, literal) argument
            val isStar = args.headOption.exists(_.isInstanceOf[UnresolvedStar]) ||
              (name == "count" && args.forall(_.isInstanceOf[Literal]))
            // value column (count(*) has none)
            val vErr: Option[String] =
              if (isStar || args.isEmpty) None
              else attr(args.head, s"$name value") match {
                case Left(e) => Some(e)
                case Right(v) =>
                  if (valueCol.exists(_ != v)) Some(s"all aggregates must share one value column (${valueCol.get} vs $v)")
                  else { valueCol = Some(v); None }
              }
            val cErr: Option[String] =
              if (vErr.isDefined) None
              else if (name.endsWith("_cate")) attr(args(1), s"$name category") match {
                case Left(e) => Some(e)
                case Right(c) =>
                  if (cateCol.exists(_ != c)) Some(s"all cate aggregates must share one category column (${cateCol.get} vs $c)")
                  else { cateCol = Some(c); None }
              } else None
            val n = args.collectFirst { case Literal(v: Number, _) => v.intValue() }.getOrElse(0)
            vErr.orElse(cErr) match {
              case Some(e) => Left(e)
              case None =>
                val kind = if (isStar && name == "count") "count" else name
                specs += AggSpec(alias, kind, frame, n)
                Right(())
            }
          }
        }
      } yield ()
    }

    projectList.foreach {
      case a: UnresolvedAttribute => outCols += a.nameParts.last
      case Alias(UnresolvedWindowExpression(fn: UnresolvedFunction, WindowSpecReference(w)), alias) =>
        windowDefs.get(w) match {
          case None => return Left(s"unknown window '$w'")
          case Some(spec) => handleWindow(fn, spec, alias) match {
            case Left(e) => return Left(e)
            case Right(_) => outCols += alias
          }
        }
      case Alias(WindowExpression(fn: UnresolvedFunction, spec: WindowSpecDefinition), alias) =>
        handleWindow(fn, spec, alias) match {
          case Left(e) => return Left(e)
          case Right(_) => outCols += alias
        }
      case other => return Left(s"unsupported select item: $other")
    }

    val built = specs.result()
    if (built.isEmpty) Left("no window aggregates found")
    else {
      // pass-through columns must be engine-carried columns
      val carried = Set(keyCol, tsCol) ++ valueCol ++ cateCol
      val bad = outCols.result().filterNot(c => carried(c) || built.exists(_.name == c))
      if (bad.nonEmpty) Left(s"select items not carried by the engine: ${bad.mkString(", ")}")
      else Right(Compiled(table, keyCol, tsCol, valueCol, cateCol, built, outCols.result()))
    }
  }
}
