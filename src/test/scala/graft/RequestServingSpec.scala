package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.serving.{FeatureStore, RequestServer, RequestServing}
import graft.streaming.SlidingWindows
import graft.streaming.SlidingWindows.{AggSpec, RangeMs, RowsN}

/** Request-mode end-to-end (mirrors the reference's
  * request_source_e2e_test.rs shape): a streaming window query keeps
  * upserting per-key features into the keyed store, and the HTTP endpoint
  * answers keyed lookups with the latest feature row.
  */
class RequestServingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def events: Seq[(Long, String, Double)] =
    (0 until 300).map { i =>
      (1704067200000L + 500L * i, s"u${i % 4}", (i % 17) / 4.0)
    }

  test("streaming upsert store + HTTP endpoint serve the latest window features per key") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val specs = Seq(AggSpec("sum_10s", "sum", RangeMs(10000)),
                    AggSpec("cnt_10s", "count", RangeMs(10000)))
    val store = new FeatureStore

    val mem = MemoryStream[(Long, String, Double)]
    val out = SlidingWindows.streaming(mem.toDF().toDF("ts_ms", "key", "value"),
      "key", "ts_ms", "value", specs, latenessMs = 0, tileGranularityMs = 2000)
    val q = out.writeStream.outputMode("append")
      .foreachBatch(FeatureStore.upsertBatch(store, "key", "ts_ms") _)
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      events.grouped(100).foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      val keys = events.map(_._2).distinct
      mem.addData(keys.map(k => (SlidingWindows.FLUSH_TS, k, 0.0)): _*)
      q.processAllAvailable()
      mem.addData((SlidingWindows.FLUSH_TS, keys.head, 0.0))
      q.processAllAvailable()
    } finally q.stop()

    // reference values: the LAST emitted row per key of the batch OVER query
    events.toDF("ts_ms", "key", "value").createOrReplaceTempView("req_evt")
    val want = spark.sql("""
      SELECT key, ts_ms, sum_10s, cnt_10s FROM (
        SELECT key, ts_ms,
               sum(value) OVER w AS sum_10s, count(value) OVER w AS cnt_10s,
               row_number() OVER (PARTITION BY key ORDER BY ts_ms DESC) AS rn
        FROM req_evt
        WINDOW w AS (PARTITION BY key ORDER BY ts_ms
                     RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW)
      ) WHERE rn = 1
    """).collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getDouble(2), r.getLong(3).toDouble)).toMap

    assert(store.size == want.size)
    want.foreach { case (k, (ts, s10, c10)) =>
      val e = store.get(k).get
      assert(e.tsMs == ts, s"key $k ts")
      assert(e.values("sum_10s") == s10, s"key $k sum")
      assert(e.values("cnt_10s") == c10, s"key $k cnt")
    }

    // HTTP round-trip
    val server = new RequestServer(store)
    val port = server.start()
    try {
      val client = HttpClient.newHttpClient()
      def post(body: String): HttpResponse[String] =
        client.send(HttpRequest.newBuilder(URI.create(s"http://localhost:$port/request"))
          .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
          HttpResponse.BodyHandlers.ofString())

      val ok = post("""{"key": "u1"}""")
      assert(ok.statusCode() == 200)
      val (ts1, s1, _) = want("u1")
      assert(ok.body().contains(s""""ts_ms":$ts1"""))
      assert(ok.body().contains(s""""sum_10s":$s1"""))
      assert(post("""{"key": "nope"}""").statusCode() == 404)
      assert(post("""not json""").statusCode() == 400)
    } finally server.stop()
  }

  test("pointInTime == batch OVER frames evaluated at the virtual point") {
    import spark.implicits._
    val df = events.toDF("ts_ms", "key", "value")
    val atTs = 1704067200000L + 500L * 200 + 250 // between events
    val got = RequestServing.pointInTime(df, "key", "ts_ms", "value",
        Seq(AggSpec("s10", "sum", RangeMs(10000)),
            AggSpec("c10", "count", RangeMs(10000)),
            AggSpec("a5r", "avg", RowsN(4))), atTs)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getLong(2), r.getDouble(3))).toMap

    val perKey = events.filter(_._1 <= atTs).groupBy(_._2)
    val want = perKey.map { case (k, rows) =>
      val inRange = rows.filter(_._1 > atTs - 10000).map(_._3)
      val last5 = rows.sortBy(_._1).takeRight(5).map(_._3)
      k -> (inRange.sum, inRange.size.toLong, last5.sum / last5.size)
    }
    assert(got.keySet == want.keySet)
    want.foreach { case (k, (s, c, a)) =>
      assert(math.abs(got(k)._1 - s) < 1e-9); assert(got(k)._2 == c)
      assert(math.abs(got(k)._3 - a) < 1e-9)
    }
  }
}
