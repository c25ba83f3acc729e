package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.api.{Pipeline, WindowSql}
import graft.streaming.SlidingWindows
import graft.streaming.SlidingWindows.{RangeMs, RowsN}

/** The reference's production path: SQL OVER windows compiled into the
  * streaming window engine — the SAME SQL must produce identical results
  * run as batch Catalyst SQL and as a streaming pipeline.
  */
class WindowSqlSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private val sql = """
    SELECT ts_ms, key, value, cate,
           sum(value) OVER w AS s10,
           count(*) OVER w AS c10,
           stddev_samp(value) OVER w AS sd10,
           sum_cate(value, cate) OVER w AS sc10,
           avg(value) OVER (PARTITION BY key ORDER BY ts_ms
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS a5r
    FROM win_evt
    WINDOW w AS (PARTITION BY key ORDER BY ts_ms
                 RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW)"""

  private def events: Seq[(Long, String, Double, String)] =
    (0 until 300).map { i =>
      (1704067200000L + 700L * i, s"k${i % 3}", (i * 3 % 21) / 4.0,
        Seq("x", "y", "z")(i % 5 % 3))
    }

  test("compile extracts key/ts and per-agg argument columns") {
    val c = WindowSql.compile(spark, sql).fold(e => fail(e), identity)
    assert(c.table == "win_evt" && c.keyCol == "key" && c.tsCol == "ts_ms")
    assert(c.aggs.map(a => (a.name, a.kind, a.frame, a.valueArg, a.cateArg)) == Seq(
      ("s10", "sum", RangeMs(10000), Some("value"), None),
      ("c10", "count", RangeMs(10000), None, None),
      ("sd10", "stddev_samp", RangeMs(10000), Some("value"), None),
      ("sc10", "sum_cate", RangeMs(10000), Some("value"), Some("cate")),
      ("a5r", "avg", RowsN(4), Some("value"), None)))
    assert(c.outCols == Seq("ts_ms", "key", "value", "cate", "s10", "c10", "sd10", "sc10", "a5r"))
  }

  test("unsupported shapes are rejected with reasons") {
    assert(WindowSql.compile(spark,
      "SELECT rank() OVER (PARTITION BY k ORDER BY t RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS r FROM t").isLeft)
    assert(WindowSql.compile(spark,
      """SELECT sum(a) OVER (PARTITION BY k1 ORDER BY t RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS x,
                sum(a) OVER (PARTITION BY k2 ORDER BY t RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS y
         FROM t""").isLeft) // two partition keys
    assert(WindowSql.compile(spark, "SELECT a, b FROM t").isLeft)
  }

  test("same SQL: streaming pipeline == batch Catalyst, via the spec loader") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    GraftSession.prepare(spark, null)

    // batch reference: plain spark.sql over the same rows
    events.toDF("ts_ms", "key", "value", "cate").createOrReplaceTempView("win_evt")
    val want = spark.sql(sql).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3),
        R.r6(r.getDouble(4)), r.getLong(5).toDouble,
        Option(r.get(6)).map(d => R.r6(d.asInstanceOf[Double])),
        r.getString(7), R.r6(r.getDouble(8)))).toSet

    val mem = MemoryStream[(Long, String, Double, String)]
    val spec = s"""{
      "execution_mode": "Streaming",
      "sources": [ { "table_name": "win_evt", "source": { "Memory": {} } } ],
      "sql": ${jstr(sql)},
      "window": { "tile_granularity_ms": 2000 },
      "sink": { "Memory": {"table_name": "win_sql_out"} }
    }"""
    val handle = Pipeline.runJson(spark, spec,
      tables = Map("win_evt" -> mem.toDF().toDF("ts_ms", "key", "value", "cate")))
    try {
      events.grouped(100).foreach { b => mem.addData(b: _*); handle.query.get.processAllAvailable() }
      val keys = events.map(_._2).distinct
      mem.addData(keys.map(k => (SlidingWindows.FLUSH_TS, k, 0.0, null: String)): _*)
      handle.query.get.processAllAvailable()
      mem.addData((SlidingWindows.FLUSH_TS, keys.head, 0.0, null: String))
      handle.query.get.processAllAvailable()
      val got = spark.table("win_sql_out").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3),
          R.r6(r.getDouble(4)), r.getDouble(5),
          Option(r.get(6)).map(d => R.r6(d.asInstanceOf[Double])),
          r.getString(7), R.r6(r.getDouble(8)))).toSet
      assert(got == want)
    } finally handle.stop()
  }

  test("flagship-shaped multi-column SQL: heterogeneous agg args, streaming == batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    GraftSession.prepare(spark, null)
    // README flagship shape on one table: two numeric columns (amount,
    // qty), a string-valued top family (product_id), and a category
    // column (product_type) — every aggregate reads its OWN argument.
    val flagSql = """
      SELECT ts_ms, user, amount, product_id, product_type,
             sum(amount) OVER w AS spent_10s,
             count(*) OVER w AS purchases_10s,
             stddev_samp(qty) OVER w AS sd_qty_10s,
             top(amount, 3) OVER w AS top_amounts,
             topn_frequency(product_id, 2) OVER w AS top_products,
             top1_ratio(product_id) OVER (PARTITION BY user ORDER BY ts_ms
               ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS dominance_10r,
             sum_cate(amount, product_type) OVER w AS spent_per_type
      FROM orders_ml
      WINDOW w AS (PARTITION BY user ORDER BY ts_ms
                   RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW)"""
    val orders = (0 until 400).map { i =>
      (1704067200000L + 600L * i, s"u${i % 3}", (i * 7 % 29) / 4.0,
        (i % 11).toDouble, s"p${i % 7}", Seq("GADGET", "BOOK", "ON_SALE")(i % 5 % 3))
    }
    orders.toDF("ts_ms", "user", "amount", "qty", "product_id", "product_type")
      .createOrReplaceTempView("orders_ml")

    type R10 = (Long, String, Double, String, String, Double, Double, Option[Double],
      String, String, Option[Double], String)
    def shape(r: org.apache.spark.sql.Row, cntLong: Boolean): R10 =
      (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3), r.getString(4),
        R.r6(r.getDouble(5)),
        if (cntLong) r.getLong(6).toDouble else r.getDouble(6),
        Option(r.get(7)).map(d => R.r6(d.asInstanceOf[Double])),
        r.getString(8), r.getString(9),
        Option(r.get(10)).map(d => R.r6(d.asInstanceOf[Double])),
        r.getString(11))
    val want = spark.sql(flagSql).collect().map(shape(_, cntLong = true)).toSet

    // batch sweep through the engine
    val c = WindowSql.compile(spark, flagSql).fold(e => fail(e), identity)
    val gotBatch = c.run(spark.table("orders_ml"), tileGranularityMs = 2000,
        useBatchSweep = true)
      .collect().map(shape(_, cntLong = false)).toSet
    assert(gotBatch == want, "batch engine sweep")

    // streaming through the spec loader
    val mem = MemoryStream[(Long, String, Double, Double, String, String)]
    val spec = s"""{
      "execution_mode": "Streaming",
      "sources": [ { "table_name": "orders_ml", "source": { "Memory": {} } } ],
      "sql": ${jstr(flagSql)},
      "window": { "tile_granularity_ms": 2000 },
      "sink": { "Memory": {"table_name": "flag_ml_out"} }
    }"""
    val handle = Pipeline.runJson(spark, spec,
      tables = Map("orders_ml" -> mem.toDF()
        .toDF("ts_ms", "user", "amount", "qty", "product_id", "product_type")))
    try {
      orders.grouped(150).foreach { b => mem.addData(b: _*); handle.query.get.processAllAvailable() }
      val keys = orders.map(_._2).distinct
      mem.addData(keys.map(k => (SlidingWindows.FLUSH_TS, k, 0.0, 0.0, null: String, null: String)): _*)
      handle.query.get.processAllAvailable()
      mem.addData((SlidingWindows.FLUSH_TS, keys.head, 0.0, 0.0, null: String, null: String))
      handle.query.get.processAllAvailable()
      val got = spark.table("flag_ml_out").collect().map(shape(_, cntLong = false)).toSet
      assert(got == want, "streaming engine via spec loader")
    } finally handle.stop()
  }

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
}
