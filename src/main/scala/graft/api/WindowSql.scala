package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction, UnresolvedRelation, UnresolvedStar}
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, CurrentRow, Expression, Literal, RangeFrame, RowFrame, SortOrder, SpecifiedWindowFrame, UnaryMinus, UnresolvedWindowExpression, WindowExpression, WindowSpecDefinition, WindowSpecReference}
import org.apache.spark.sql.catalyst.plans.logical.{Project, WithWindowDefinition}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StringType

import graft.streaming.SlidingWindows
import graft.streaming.SlidingWindows.{AggSpec, Frame, RangeMs, RowsN}

/** SQL OVER-window compiler for the streaming engine — the reference's
  * production path: SQL goes in, the planner splits PARTITION BY into a
  * KeyBy and the window expressions into the WindowOperator
  * (src/api/planner.rs:390-432). Spark's own streaming runner rejects
  * per-row OVER windows, so this compiler parses the query, extracts the
  * window specs, and routes them through the sliding-window engine — the
  * SAME SQL then runs in batch mode via Catalyst and in streaming mode
  * via the engine, with identical results.
  *
  * Supported shape (the reference's window contract, SURVEY §2.6: one
  * PARTITION BY key, ORDER BY one ms timestamp column, frames
  * `RANGE/ROWS ... PRECEDING AND CURRENT ROW`):
  *
  * {{{
  * SELECT <key>, <ts>, [arg columns...,]
  *        sum(<num>) OVER w AS a,  count(*) OVER w AS b,
  *        stddev_samp(<num2>) OVER w AS c,
  *        top(<num or str>, 3) OVER w AS d,
  *        topn_frequency(<num or str>, 2) OVER w AS e,
  *        sum_cate(<num>, <str>) OVER w AS f
  * FROM <table>
  * WINDOW w AS (PARTITION BY <key> ORDER BY <ts>
  *              RANGE BETWEEN <ms> PRECEDING AND CURRENT ROW)
  * }}}
  *
  * Each aggregate evaluates its own argument columns (numeric value
  * columns, string values for the top family, string categories) — the
  * engine's state rows carry one slot per referenced column.
  */
object WindowSql {

  /** One compiled window aggregate: slots are resolved against the source
    * schema at run time (the parser can't know column types). */
  final case class AggDef(name: String, kind: String, frame: Frame, n: Int,
                          valueArg: Option[String], cateArg: Option[String])

  final case class Compiled(
      table: String,
      keyCol: String,
      tsCol: String,
      aggs: Seq[AggDef],
      /** Output columns in SELECT order (pass-through cols + aliases). */
      outCols: Seq[String]) {

    /** Run the compiled windows over a (streaming or batch) frame of the
      * source table through the engine. */
    def run(src: DataFrame, latenessMs: Long = 0,
            tileGranularityMs: Long = 60000L,
            useBatchSweep: Boolean = false): DataFrame = {
      val schema = src.schema
      def isStr(c: String): Boolean =
        schema(schema.fieldIndex(c)).dataType == StringType
      // slot assignment: numeric value columns + string columns (top-family
      // string values and categories), in first-use order
      val numCols = aggs.flatMap(_.valueArg).filter(!isStr(_)).distinct
      val strCols = (aggs.flatMap(_.valueArg).filter(isStr) ++
        aggs.flatMap(_.cateArg)).distinct
      val specs = aggs.map { a =>
        val vStr = a.valueArg.exists(isStr)
        if (SlidingWindows.isCate(a.kind) && vStr)
          sys.error(s"${a.name}: the cate family needs a numeric value column")
        if (vStr && !(a.kind == "count" || SlidingWindows.cmKinds.contains(a.kind)))
          sys.error(s"${a.name}: ${a.kind} needs a numeric value column")
        val useStr = vStr && a.kind != "count"
        val vIdx = a.valueArg match {
          case Some(v) if useStr => strCols.indexOf(v)
          case Some(v) if !vStr  => numCols.indexOf(v)
          case _                 => 0 // count(*) / count(<str>): no value slot read
        }
        val cIdx = a.cateArg.map(strCols.indexOf).getOrElse(0)
        AggSpec(a.name, a.kind, a.frame, a.n, math.max(vIdx, 0), cIdx, useStr)
      }
      val out =
        if (useBatchSweep)
          SlidingWindows.batchComputeMulti(src, keyCol, tsCol, numCols, strCols,
            specs, tileGranularityMs)
        else
          SlidingWindows.streamingMulti(src, keyCol, tsCol, numCols, strCols,
            specs, latenessMs, tileGranularityMs)
      // engine emits (ts_ms, key, <numCols>, <strCols>, <specs>) with the
      // original column names — only ts/key need renaming back
      out.withColumnRenamed("ts_ms", tsCol).withColumnRenamed("key", keyCol)
        .select(outCols.map(col): _*)
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
    val aggs = Seq.newBuilder[AggDef]
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
            val valueArg: Either[String, Option[String]] =
              if (isStar || args.isEmpty) Right(None)
              else attr(args.head, s"$name value").map(Some(_))
            val cateArg: Either[String, Option[String]] =
              if (name.endsWith("_cate")) attr(args(1), s"$name category").map(Some(_))
              else Right(None)
            val n = args.collectFirst { case Literal(v: Number, _) => v.intValue() }.getOrElse(0)
            (valueArg, cateArg) match {
              case (Right(v), Right(c)) =>
                aggs += AggDef(alias, name, frame, n, v, c)
                Right(())
              case (Left(e), _) => Left(e)
              case (_, Left(e)) => Left(e)
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

    val built = aggs.result()
    if (built.isEmpty) Left("no window aggregates found")
    else {
      // pass-through columns must be engine-carried columns
      val carried = Set(keyCol, tsCol) ++
        built.flatMap(_.valueArg) ++ built.flatMap(_.cateArg)
      val bad = outCols.result().filterNot(c => carried(c) || built.exists(_.name == c))
      if (bad.nonEmpty) Left(s"select items not carried by the engine: ${bad.mkString(", ")}")
      else Right(Compiled(table, keyCol, tsCol, built, outCols.result()))
    }
  }
}
