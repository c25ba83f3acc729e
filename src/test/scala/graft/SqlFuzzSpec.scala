package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.tools.SqlFuzz

/** Spark-side pin of the SQL fuzz harness (the DuckDB half runs via
  * `scripts/sql_fuzz.py`, driver-side tooling): the generator must be
  * deterministic in its seed — a fuzz failure that can't be replayed is
  * noise — and every generated query must parse and execute on Spark.
  * The cross-engine value comparison itself is the committed SQLFUZZ
  * artifact's job; this spec keeps the generator from drifting silently
  * between soaks.
  */
class SqlFuzzSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // isolated temp-view catalog: this spec registers RAW parquet views
    // under the shared table names (events.ts as TIMESTAMP, not the
    // normalized BIGINT-nanos contract view) — in the suite's shared JVM
    // that would clobber the views every later suite resolves against
    s.newSession()
  }

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val pools = {
    for (t <- SqlFuzz.tables)
      spark.read.parquet(s"$sfDir/${t.name}.parquet")
        .createOrReplaceTempView(t.name)
    SqlFuzz.samplePools(spark, sfDir)
  }

  test("generation is a pure function of (seedBase, i)") {
    val a = (0 until 60).map(i => SqlFuzz.gen(i, 42000L, pools))
    val b = (0 until 60).map(i => SqlFuzz.gen(i, 42000L, pools))
    assert(a == b)
    val c = (0 until 60).map(i => SqlFuzz.gen(i, 99000L, pools))
    // different base must actually move the draws (not all shapes change
    // every token, but across 60 queries at least most must differ)
    assert(a.zip(c).count { case ((_, x), (_, y)) => x != y } > 40)
  }

  test("every generated query parses and executes on Spark") {
    // one seed base x a modest pool; the soak runs hundreds via the tool
    (0 until 30).foreach { i =>
      val (name, sql) = SqlFuzz.gen(i, 42000L, pools)
      try {
        val n = spark.sql(sql).count()
        assert(n >= 0, s"$name returned negative count")
      } catch {
        case e: Exception =>
          fail(s"$name failed (replay seed=${42000L + i}): ${e.getMessage}\n$sql")
      }
    }
  }

  test("string pools drop NULLs and backslash values at the source (r16 NPE pin)") {
    // the r16 failure: ascending distinct order put NULLs inside the
    // limit-24 window, one reached strVals, and sqlStr NPE'd — killing
    // the whole fuzz run. Engineer exactly that window shape.
    import spark.implicits._
    val df = Seq[Option[String]](None, None, Some("AAA"), Some("a\\b"),
      Some("BUILDING"), None, Some("zz")).toDF("s")
    val pool = SqlFuzz.stringPool(df, "s")
    assert(pool == Seq("AAA", "BUILDING", "zz"), pool.toString)
    // and every pooled value must round-trip the literal quoter (the NPE site)
    pool.foreach { v => assert(v != null); spark.sql(s"SELECT '${v.replace("'", "''")}'") }
  }

  test("ORDER BY is always total and deterministic-by-construction") {
    // structural guard: every generated query must end in an ORDER BY
    // over NULLS FIRST keys + LIMIT (the comparability contract the
    // DuckDB side relies on), and never order by an aggregate alias
    (0 until 120).foreach { i =>
      val (name, sql) = SqlFuzz.gen(i, 77000L, pools)
      assert(sql.contains("ORDER BY") && sql.contains("NULLS FIRST") &&
        sql.contains("LIMIT"), s"$name missing total order: $sql")
      val orderClause = sql.substring(sql.lastIndexOf("ORDER BY"))
      assert(!orderClause.contains("agg_"), s"$name orders by an aggregate: $sql")
    }
  }
}
