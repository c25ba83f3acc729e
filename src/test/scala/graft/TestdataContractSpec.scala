package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Real-testdata schema canary: the driver regenerates /root/testdata
  * between rounds, and a physical-type drift there (round 6: events.ts
  * TIMESTAMP(NANOS) -> TIMESTAMP(MICROS)) must fail HERE as one named
  * assertion, not as dozens of confusing downstream analysis errors.
  * Asserts the NORMALIZED view types that every catalog query assumes —
  * i.e. the GraftSession.prepare load contract, not the raw file layout.
  * Skipped when the testdata dir is absent (pure-sbt environments).
  */
class TestdataContractSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  private def withSession[A](f: SparkSession => A): A = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    f(s)
  }

  private def typeOf(s: SparkSession, table: String, col: String): DataType =
    s.table(table).schema(col).dataType

  test("GraftSession.prepare normalizes every table to the load contract") {
    assume(new java.io.File(dir).isDirectory, s"$dir not present; skipping")
    withSession { s =>
      GraftSession.prepare(s, dir)

      // The contract every catalog query is written against: ts is BIGINT
      // epoch nanos (ts DIV 1000000 must analyze), regardless of whether
      // the parquet stores int64-nanos or a timestamp type.
      assert(typeOf(s, "events", "ts") == LongType,
        "events.ts must normalize to BIGINT nanos")
      assert(typeOf(s, "events", "event_id") == LongType)
      assert(typeOf(s, "events", "user_id") == LongType)
      assert(typeOf(s, "events", "event_type") == StringType)
      assert(typeOf(s, "events", "value") == DoubleType)

      // ts DIV 1000000 must actually analyze and yield sane ms epochs
      // (post-2020, pre-2100) — catches a unit drift (ms-vs-us-vs-ns files)
      // that a type check alone would miss.
      val r = s.sql(
        """SELECT min(ts DIV 1000000) AS lo, max(ts DIV 1000000) AS hi
           FROM events""").head()
      assert(r.getLong(0) > 1577836800000L && r.getLong(1) < 4102444800000L,
        s"events.ts ms-epoch range looks wrong: ${r.getLong(0)}..${r.getLong(1)} " +
        "— did the testdata unit change?")

      // Non-events tables load as-read (identity contract): assert the RAW
      // frames, not the shared-session views — parallel suites legitimately
      // shadow view names like "orders" with synthetic frames (WindowSqlSpec),
      // and this canary is about the testdata files, not catalog state.
      def rawType(table: String, col: String): DataType =
        GraftSession.table(s, dir, table).schema(col).dataType

      // Text/ANN families.
      assert(rawType("documents", "doc_id") == LongType)
      assert(rawType("documents", "text") == StringType)
      assert(rawType("embeddings", "vec_id") == LongType)
      assert(rawType("embeddings", "embedding") match {
        case ArrayType(FloatType | DoubleType, _) => true
        case _ => false
      }, "embeddings.embedding must be array<float|double>")

      // TPC-H-ish keys the join/agg catalog touches.
      assert(rawType("lineitem", "l_orderkey") == LongType)
      assert(rawType("orders", "o_orderkey") == LongType)
      assert(rawType("customer", "c_custkey") == LongType)
    }
  }

  test("tsRangeMs bound reaches the parquet scan as a PushedFilter") {
    assume(new java.io.File(dir).isDirectory, s"$dir not present; skipping")
    withSession { s =>
      import org.apache.spark.sql.execution.FileSourceScanExec
      import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
      GraftSession.prepare(s, dir)
      val raw = GraftSession.table(s, dir, "events")
      val hi = s.sql("SELECT max(ts DIV 1000000) FROM events").head().getLong(0)
      val lo = hi - 86400000L
      val bounded = GraftSession.normalizeTs(
        raw.where(GraftSession.tsRangeMs(raw, lo, hi + 1)), dir)
      // value equivalence with the nanos-contract predicate on the view
      val want = s.sql(
        s"SELECT count(*) FROM events WHERE ts >= ${lo * 1000000L} AND ts < ${(hi + 1) * 1000000L}")
        .head().getLong(0)
      assert(bounded.count() == want && want > 0)
      // the bound must constant-fold into literal comparisons ON THE RAW
      // COLUMN and reach the scan as PushedFilters (row-group pruning at
      // 100 TB); a filter on the derived BIGINT ts would not push
      def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
        p.collect {
          case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
          case f: FileSourceScanExec => Seq(f)
        }.flatten
      val sc = scans(bounded.queryExecution.executedPlan)
      assert(sc.nonEmpty, "no file scan in plan")
      val pushed = sc.map(_.metadata.getOrElse("PushedFilters", "")).mkString(";")
      assert(pushed.contains("GreaterThanOrEqual(ts") && pushed.contains("LessThan(ts"),
        s"ts bound not pushed to the parquet scan: $pushed")
    }
  }
}
