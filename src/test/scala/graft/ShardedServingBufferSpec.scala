package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.serving.{FeatureStore, RequestServer, ServingBuffer, ShardedServingBuffer}
import graft.streaming.SlidingWindows.{AggSpec, RangeMs, RowsN}

/** The live request path sharded off the driver: executor-written
  * per-shard row logs tailed into horizon-bounded in-memory buffers.
  * Pinned against the driver-memory ServingBuffer fed the same rows.
  */
class ShardedServingBufferSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private val specs = Seq(
    AggSpec("sum_10s", "sum", RangeMs(10000)),
    AggSpec("cnt_10s", "count", RangeMs(10000)),
    AggSpec("a5", "avg", RowsN(4)),
    AggSpec("sc", "sum_cate", RangeMs(10000)))

  /** Equality where NaN == NaN (an empty-frame avg is NaN on both sides). */
  private def same(a: Any, b: Any): Boolean = (a, b) match {
    case (x: Double, y: Double) => x == y || (x.isNaN && y.isNaN)
    case (x: Seq[_], y: Seq[_]) =>
      x.length == y.length && x.zip(y).forall { case (p, q) => same(p, q) }
    case (x: Product, y: Product) =>
      x.productArity == y.productArity &&
        x.productIterator.zip(y.productIterator).forall { case (p, q) => same(p, q) }
    case (x: Option[_], y: Option[_]) =>
      (x, y) match {
        case (Some(p), Some(q)) => same(p, q)
        case (None, None) => true
        case _ => false
      }
    case _ => a == b
  }

  private def events: Seq[(Long, String, Double, String)] =
    (0 until 400).map { i =>
      (1704067200000L + 400L * i, s"u${i % 8}", (i % 17) / 4.0,
        Seq("a", "b", "c")(i % 3))
    }

  test("sharded eval == driver-memory eval for every key and virtual point") {
    import spark.implicits._
    val root = GraftSession.tempDir("graft_ssb_")
    val sharded = new ShardedServingBuffer(root, 4, specs)
    val driver = new ServingBuffer(specs)

    val df = events.toDF("ts_ms", "key", "value", "cate")
    graft.serving.ServingBuffer.feedBatch(driver, "key", "ts_ms",
      Seq("value"), Seq("cate"))(df, 0L)
    ShardedServingBuffer.feedBatch(root, 4, "key", "ts_ms",
      Seq("value"), Seq("cate"), specs)(df, 0L)

    val keys = events.map(_._2).distinct
    val atPoints = Seq(None, Some(1704067200000L + 400L * 250 + 37),
      Some(1704067200000L + 400L * 399))
    for (k <- keys; at <- atPoints) {
      assert(same(sharded.eval(k, at), driver.eval(k, at)), s"key $k at $at")
    }
    // evalBatch parity too (the coalescer path)
    val reqs = keys.map(k => (k, atPoints(1)))
    assert(same(sharded.evalBatch(reqs), driver.evalBatch(reqs)))
    assert(sharded.bufferedKeys == 8)
    // unknown key: no buffered rows -> None (store fallback at the server)
    assert(sharded.eval("nope", None).isEmpty)
  }

  test("incremental feed: a reader that already tailed sees later batches") {
    import spark.implicits._
    val root = GraftSession.tempDir("graft_ssb_inc_")
    val sharded = new ShardedServingBuffer(root, 2, specs)
    val driver = new ServingBuffer(specs)
    val (b1, b2) = events.splitAt(200)
    def feed(rows: Seq[(Long, String, Double, String)]): Unit = {
      val df = rows.toDF("ts_ms", "key", "value", "cate")
      graft.serving.ServingBuffer.feedBatch(driver, "key", "ts_ms",
        Seq("value"), Seq("cate"))(df, 0L)
      ShardedServingBuffer.feedBatch(root, 2, "key", "ts_ms",
        Seq("value"), Seq("cate"), specs)(df, 0L)
    }
    feed(b1)
    assert(same(sharded.eval("u1", None), driver.eval("u1", None))) // tails batch 1
    feed(b2)
    events.map(_._2).distinct.foreach { k =>
      assert(same(sharded.eval(k, None), driver.eval(k, None)), s"key $k after batch 2")
    }
  }

  test("row-log compaction keeps the serving retention; results at the head unchanged") {
    import spark.implicits._
    val root = GraftSession.tempDir("graft_ssb_cmp_")
    val sharded = new ShardedServingBuffer(root, 1, specs)
    val driver = new ServingBuffer(specs)
    // many batches so the log accumulates history far beyond the horizon
    val all = (0 until 2000).map { i =>
      (1704067200000L + 400L * i, s"u${i % 4}", (i % 23) / 2.0,
        Seq("a", "b", "c")(i % 3))
    }
    // a COLD key: all its rows in the first batch, older than the hot
    // keys' horizon by the end — per-key retention must keep ITS frame
    // history even as the shard's max ts advances far past it
    val coldRows = (0 until 6).map(i =>
      (1704067200000L + 300L * i, "cold", 7.0 + i, "a"))
    ((coldRows ++ all.take(494)) +: all.drop(494).grouped(500).toSeq).zipWithIndex
      .foreach { case (rows, gi) =>
      val df = rows.toDF("ts_ms", "key", "value", "cate")
      graft.serving.ServingBuffer.feedBatch(driver, "key", "ts_ms",
        Seq("value"), Seq("cate"))(df, gi.toLong)
      // 1-byte threshold: every batch triggers the retention rewrite
      ShardedServingBuffer.feedBatch(root, 1, "key", "ts_ms",
        Seq("value"), Seq("cate"), specs, compactBytes = 1L)(df, gi.toLong)
    }
    val log = java.nio.file.Paths.get(root, "shard-00000", "rows.log")
    val logRows = {
      val bytes = java.nio.file.Files.readAllBytes(log)
      var pos = 0; var n = 0
      while (pos + 4 <= bytes.length) {
        val l = java.nio.ByteBuffer.wrap(bytes, pos, 4).getInt
        pos += 4 + l; n += 1
      }
      n
    }
    assert(logRows < 500, s"retention rewrite kept $logRows of 2000 rows")
    // evaluation at the newest point (what live serving answers) matches
    // the driver buffer that saw the full history — the frames only
    // reference rows inside the retained horizon
    ((0 until 4).map(k => s"u$k") :+ "cold").foreach { k =>
      assert(same(sharded.eval(k, None), driver.eval(k, None)), s"key $k")
    }
    // the cold key's own-frame history really survived (not just a
    // single newest row): its 10s RANGE count at its newest point is > 1
    val coldCnt = sharded.eval("cold", None).get._2.toMap.apply("cnt_10s")
    assert(coldCnt.asInstanceOf[Number].longValue > 1L,
      s"cold key kept only $coldCnt rows — retention was shard-global")
  }

  test("Pipeline JSON request mode with sharded serving: store + live path end-to-end") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.api.Pipeline
    import graft.streaming.SlidingWindows
    val mem = MemoryStream[(Long, String, Double)]
    val spec = """{
      "execution_mode": "Request",
      "sources": [ { "table_name": "ev_sharded", "source": { "Memory": {} } } ],
      "window": { "key_column": "key", "ts_column": "ts_ms", "value_column": "value",
                  "tile_granularity_ms": 2000,
                  "aggs": [ {"name": "sum_10s", "kind": "sum", "range_ms": 10000} ] },
      "request_source_sink": { "bind_address": "127.0.0.1:0",
                               "sharded": { "num_shards": 4 } }
    }"""
    val handle = Pipeline.runJson(spark, spec,
      tables = Map("ev_sharded" -> mem.toDF().toDF("ts_ms", "key", "value")))
    try {
      assert(handle.store.get.isInstanceOf[graft.serving.ShardedFeatureStore])
      assert(handle.buffer.get.isInstanceOf[ShardedServingBuffer])
      val t0 = 1704067200000L
      val rows = (0 until 40).map(i => (t0 + 500L * i, "u1", 2.0))
      mem.addData(rows: _*); handle.query.get.processAllAvailable()
      handle.feeder.get.processAllAvailable()
      mem.addData((SlidingWindows.FLUSH_TS, "u1", 0.0)); handle.query.get.processAllAvailable()
      mem.addData((SlidingWindows.FLUSH_TS, "u1", 0.0)); handle.query.get.processAllAvailable()
      handle.feeder.get.processAllAvailable()

      val client = HttpClient.newHttpClient()
      def post(body: String): HttpResponse[String] =
        client.send(HttpRequest.newBuilder(
            URI.create(s"http://localhost:${handle.port.get}/request"))
          .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
          HttpResponse.BodyHandlers.ofString())
      // live path: evaluate at the newest buffered event from sharded logs
      val tLast = rows.last._1
      val want = rows.filter(r => r._1 >= tLast - 10000 && r._1 <= tLast).map(_._3).sum
      val live = post("""{"key": "u1"}""")
      assert(live.statusCode() == 200, live.body())
      assert(live.body().contains(""""live":true"""), live.body())
      assert(live.body().contains(s""""sum_10s":$want"""), live.body())
      // the upsert store fallback reads from the sharded log store
      assert(handle.store.get.get("u1").get.tsMs == tLast)
      assert(post("""{"key": "nope"}""").statusCode() == 404)
    } finally handle.stop()
  }

  test("HTTP live path serves from the sharded buffer") {
    import spark.implicits._
    val root = GraftSession.tempDir("graft_ssb_http_")
    val sharded = new ShardedServingBuffer(root, 4, specs)
    val df = events.toDF("ts_ms", "key", "value", "cate")
    ShardedServingBuffer.feedBatch(root, 4, "key", "ts_ms",
      Seq("value"), Seq("cate"), specs)(df, 0L)
    val server = new RequestServer(new FeatureStore, 0, Some(sharded))
    val port = server.start()
    try {
      val client = HttpClient.newHttpClient()
      def post(body: String): HttpResponse[String] =
        client.send(HttpRequest.newBuilder(URI.create(s"http://localhost:$port/request"))
          .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
          HttpResponse.BodyHandlers.ofString())
      val want = sharded.eval("u3", None).get
      val ok = post("""{"key": "u3"}""")
      assert(ok.statusCode() == 200)
      assert(ok.body().contains(""""live":true"""))
      assert(ok.body().contains(s""""ts_ms":${want._1}"""))
      val sum = want._2.toMap.apply("sum_10s")
      assert(ok.body().contains(s""""sum_10s":$sum"""), ok.body())
      assert(post("""{"key": "ghost"}""").statusCode() == 404)
    } finally server.stop()
  }
}
