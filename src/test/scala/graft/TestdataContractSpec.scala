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

  test("corpus-shape premises of the TPC-H adaptations still hold") {
    // The r11 TPC-H entries adapt spec predicates to THIS corpus's
    // shape; a driver testdata regen that changes these would leave the
    // entries oracle-green but semantically hollow (empty results still
    // hash-match). This canary makes such a drift loud at round start.
    withSession { s =>
      GraftSession.prepare(s, dir)
      // Q22: cntrycode = substr(c_name, 17, 2) assumes 'Customer#%09d'
      val badNames = s.sql(
        "SELECT count(*) FROM customer WHERE c_name NOT RLIKE '^Customer#[0-9]{9}$'")
        .head().getLong(0)
      assert(badNames == 0, "customer name format drifted — Q22's cntrycode is garbage")
      // Q22: 'no orders' adapted to 'no URGENT order' BECAUSE every
      // customer has orders; both halves must stay true
      val orderless = s.sql(
        """SELECT count(*) FROM customer c WHERE NOT EXISTS
           (SELECT 1 FROM orders WHERE o_custkey = c.c_custkey)""").head().getLong(0)
      assert(orderless == 0,
        "customers without orders appeared — Q22 should revert to the spec's literal anti join")
      val nonUrgent = s.sql(
        """SELECT count(*) FROM customer c WHERE NOT EXISTS
           (SELECT 1 FROM orders WHERE o_custkey = c.c_custkey
            AND o_orderpriority = '1-URGENT')""").head().getLong(0)
      assert(nonUrgent > 0, "every customer has an URGENT order — Q22's survivor set is empty")
      // Q9: the LIKE '%red%' part filter must select a non-trivial set
      val redParts = s.sql("SELECT count(*) FROM part WHERE p_name LIKE '%red%'")
        .head().getLong(0)
      assert(redParts > 0, "p_name vocabulary drifted — Q9's LIKE filter is empty")
      // Q7/Q11/Q21: the named-nation parameters must stay populated
      val pairSupp = s.sql(
        """SELECT count(*) FROM supplier JOIN nation ON s_nationkey = n_nationkey
           WHERE n_name IN ('NATION_13', 'NATION_19')""").head().getLong(0)
      assert(pairSupp > 0, "NATION_13/NATION_19 lost their suppliers — retune Q7/Q11 params")
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
