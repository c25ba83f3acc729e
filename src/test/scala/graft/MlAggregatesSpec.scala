package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Golden tests for the ML aggregate family, replicating the reference's
  * documented input->output fixtures verbatim
  * (reference: src/runtime/operators/window/top/README.md examples).
  */
class MlAggregatesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    GraftSession.prepare(s, null)
    s
  }

  private def one(sql: String): Any = spark.sql(sql).collect()(0).get(0)

  test("BufCodec roundtrips every buffer family exactly") {
    import graft.functions._
    import graft.functions.SV._
    val cm = new CountMapBuf
    cm.add(DblV(1.5), 3); cm.add(StrV("héllo,x:y"), 2); cm.add(LongV(-7)); cm.add(BoolV(true))
    val cm2 = BufCodec.readCountMap(BufCodec.writeCountMap(cm))
    assert(cm2.m == cm.m)

    val cate = new CateMapBuf
    cate.acc(StrV("a")).add(DblV(2.25)); cate.acc(StrV("a")).add(LongV(4))
    cate.acc(StrV("empty-min")).count = 5 // count-only acc (min/max null)
    val cate2 = BufCodec.readCateMap(BufCodec.writeCateMap(cate))
    assert(cate2.m.keySet == cate.m.keySet)
    cate.m.foreach { case (k, a) =>
      val b = cate2.m(k)
      assert(b.count == a.count && b.sum == a.sum && b.min == a.min && b.max == a.max)
    }

    val ratio = new RatioBuf
    ratio.acc(StrV("x"))(0) = 10; ratio.acc(StrV("x"))(1) = 3
    val ratio2 = BufCodec.readRatio(BufCodec.writeRatio(ratio))
    assert(ratio2.m.view.mapValues(_.toSeq).toMap == ratio.m.view.mapValues(_.toSeq).toMap)
  }

  test("top(value, n): top n values desc, duplicates preserved (top/README.md ex.1)") {
    import spark.implicits._
    Seq((1000L, 1.0), (2000L, 2.0), (3000L, 4.0), (4000L, 4.0), (5000L, 3.0))
      .toDF("timestamp", "value").createOrReplaceTempView("t")
    assert(one("SELECT top(value, 3) FROM t") == "4,4,3")
  }

  test("topn_frequency(value, n): by frequency desc (top/README.md ex.2)") {
    import spark.implicits._
    Seq((1000L, 1.0), (2000L, 1.0), (3000L, 2.0), (4000L, 2.0), (5000L, 2.0), (6000L, 3.0))
      .toDF("timestamp", "value").createOrReplaceTempView("t")
    assert(one("SELECT topn_frequency(value, 2) FROM t") == "2,1")
  }

  test("top1_ratio(value): freq(top1)/total (top/README.md ex.3)") {
    import spark.implicits._
    Seq((1000L, 1.0), (2000L, 1.0), (3000L, 2.0), (4000L, 2.0))
      .toDF("timestamp", "value").createOrReplaceTempView("t")
    assert(one("SELECT top1_ratio(value) FROM t") == 0.5)
  }

  test("top_n_key_sum_cate_where: per-cate sum, top n by key desc (top/README.md ex.4)") {
    import spark.implicits._
    Seq((1000L, 1.0, "a"), (2000L, 3.0, "b"), (3000L, 5.0, "b"), (4000L, 2.0, "c"), (5000L, 4.0, "c"))
      .toDF("timestamp", "value", "pk").createOrReplaceTempView("t")
    assert(one("SELECT top_n_key_sum_cate_where(value, value > 0, pk, 2) FROM t") == "c:6,b:8")
    assert(one("SELECT top_n_value_sum_cate_where(value, value > 0, pk, 2) FROM t") == "b:8,c:6")
  }

  test("top_n_{key,value}_ratio_cate (top/README.md ex.6/7)") {
    import spark.implicits._
    Seq((1000L, 1.0, "c"), (2000L, 2.0, "b"), (3000L, 3.0, "b"))
      .toDF("timestamp", "value", "pk").createOrReplaceTempView("t")
    assert(one("SELECT top_n_key_ratio_cate(value, value > 1, pk, 2) FROM t") == "c:0,b:1")
    assert(one("SELECT top_n_value_ratio_cate(value, value > 1, pk, 2) FROM t") == "b:1,c:0")
  }

  test("sum_cate: parts sorted lexicographically; empty -> empty string") {
    import spark.implicits._
    Seq(("x", 1.5, "b"), ("x", 2.0, "a"), ("x", 0.5, "b"))
      .toDF("k", "value", "cate").createOrReplaceTempView("t")
    assert(one("SELECT sum_cate(value, cate) FROM t GROUP BY k") == "a:2,b:2")
    // cond excludes everything -> no categories -> ""
    assert(one("SELECT sum_cate_where(value, value > 99, cate) FROM t GROUP BY k") == "")
  }

  test("x_where family rewrites to built-ins with IF-mask semantics") {
    import spark.implicits._
    Seq((1.0, true), (2.0, false), (3.0, true)).toDF("v", "c").createOrReplaceTempView("t")
    assert(one("SELECT sum_where(v, c) FROM t") == 4.0)
    assert(one("SELECT count_where(v, c) FROM t") == 2L)
    assert(one("SELECT avg_where(v, c) FROM t") == 2.0)
    assert(one("SELECT min_where(v, c) FROM t") == 1.0)
    assert(one("SELECT max_where(v, c) FROM t") == 3.0)
  }

  test("float format parity: 6 decimals trimmed (format.rs contract)") {
    import graft.functions.SV
    assert(SV.formatFloat(4.0) == "4")
    assert(SV.formatFloat(0.5) == "0.5")
    assert(SV.formatFloat(0.0) == "0")
    assert(SV.formatFloat(1.0 / 3.0) == "0.333333")
    assert(SV.formatFloat(-1.5) == "-1.5")
    assert(SV.formatFloat(185.22) == "185.22")
  }

  test("ML aggregates work over window frames (streaming window semantics)") {
    import spark.implicits._
    Seq((1000L, "k", 1.0), (2000L, "k", 2.0), (3000L, "k", 4.0), (4000L, "k", 4.0), (5000L, "k", 3.0))
      .toDF("ts", "key", "value").createOrReplaceTempView("t")
    val rows = spark.sql("""
      SELECT ts, top(value, 2) OVER (PARTITION BY key ORDER BY ts
        RANGE BETWEEN 2000 PRECEDING AND CURRENT ROW) AS topv
      FROM t ORDER BY ts""").collect()
    assert(rows.map(_.getString(1)).toSeq ==
      Seq("1", "2,1", "4,2", "4,4", "4,4"))
  }

  test("kmv_distinct: exact below k, ~accurate above, merge-invariant") {
    import spark.implicits._
    // 40 distinct ids, k=64 -> the sketch holds them all: exact
    (1 to 200).map(i => ("g", s"id${i % 40}")).toDF("g", "v").createOrReplaceTempView("small")
    val exact = one("""SELECT kmv_distinct(
        CAST(conv(substring(md5(v), 1, 15), 16, 10) AS BIGINT),64) FROM small GROUP BY g""")
    assert(exact == 40.0)

    // 5000 distinct ids, k=256 -> estimate; KMV relative error ~1/sqrt(k-2)
    // (~6.3%), assert a loose 3-sigma band. Deterministic: fixed hash.
    (1 to 5000).map(i => ("g", s"user-$i")).toDF("g", "v").createOrReplaceTempView("big")
    val est = one("""SELECT kmv_distinct(
        CAST(conv(substring(md5(v), 1, 15), 16, 10) AS BIGINT),256) FROM big GROUP BY g""")
      .asInstanceOf[Double]
    assert(math.abs(est - 5000) / 5000 < 0.20, s"estimate $est too far from 5000")

    // partial/merge across partitions must not change the result
    val repart = spark.table("big").repartition(7)
    repart.createOrReplaceTempView("big7")
    val est7 = one("""SELECT kmv_distinct(
        CAST(conv(substring(md5(v), 1, 15), 16, 10) AS BIGINT),256) FROM big7 GROUP BY g""")
    assert(est7 == est, "sketch must be merge-order-invariant")

    // and it runs over window frames like the rest of the family
    (1 to 50).map(i => (i.toLong, s"u${i % 7}")).toDF("seq", "v").createOrReplaceTempView("wf")
    val wrows = spark.sql("""
      SELECT seq, kmv_distinct(CAST(conv(substring(md5(v), 1, 15), 16, 10) AS BIGINT), 64)
               OVER (ORDER BY seq ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS d
      FROM wf ORDER BY seq""").collect()
    assert(wrows(6).getDouble(1) == 7.0 && wrows(49).getDouble(1) == 7.0)
  }
}
