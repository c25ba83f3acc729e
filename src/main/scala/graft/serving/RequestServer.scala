package graft.serving

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

/** HTTP feature-serving endpoint — the reference's request source/sink
  * pair (src/runtime/functions/source/request_source.rs:38-190: axum
  * server, `POST /request` with a keyed JSON payload, response completed
  * with the feature row; src/runtime/functions/sink/request_sink.rs).
  *
  * `POST /request` body `{"key": "<entity key>"[, "ts_ms": <event ms>]}`.
  * With a `live` [[ServingBuffer]] wired, every window aggregate is
  * re-evaluated AT the request's timestamp (`ts_ms`, default: the key's
  * newest buffered event) against the buffered rows — the reference's
  * request-path semantics (window_request_operator.rs:90-300), never stale
  * by an emission interval. Keys with no buffered rows fall back to the
  * latest feature row from the [[FeatureStore]] the streaming query keeps
  * upserting. Without `live`, lookups serve the store row directly.
  * Unknown keys get 404; malformed payloads 400.
  *
  * Built on the JDK's HttpServer (no extra dependencies); JSON via
  * Jackson, which Spark already ships.
  */
final class RequestServer(store: FeatureStore, port: Int = 0,
                          live: Option[ServingBuffer] = None) {

  private val mapper = new ObjectMapper()
  private var server: HttpServer = _

  /** Starts the server; returns the actual bound port. */
  def start(): Int = {
    // JDK HttpServer leaves Nagle's algorithm on, and a response is two
    // small writes (headers, then body): with client-side delayed ACKs
    // every lookup stalls ~40 ms. Must be set before the first HttpServer
    // class-load reads its static config.
    System.setProperty("sun.net.httpserver.nodelay", "true")
    server = HttpServer.create(new InetSocketAddress(port), 0)
    server.createContext("/request", new HttpHandler {
      override def handle(ex: HttpExchange): Unit =
        try respond(ex) finally ex.close()
    })
    // a small worker pool, not the dispatcher thread: lookups are
    // sub-millisecond map reads, but concurrent clients must not serialize
    // behind one socket loop (the reference's axum server is concurrent).
    // Daemon threads: a crash between start() and stop() must not keep the
    // JVM alive on a non-daemon pool.
    pool = java.util.concurrent.Executors.newFixedThreadPool(8,
      (r: Runnable) => {
        val t = new Thread(r, "graft-request-server")
        t.setDaemon(true); t
      })
    server.setExecutor(pool)
    server.start()
    server.getAddress.getPort
  }

  private var pool: java.util.concurrent.ExecutorService = _

  def stop(): Unit = {
    if (server != null) server.stop(0)
    if (pool != null) {
      pool.shutdown()
      // let in-flight handlers finish writing their responses
      pool.awaitTermination(2, java.util.concurrent.TimeUnit.SECONDS)
    }
  }

  private def respond(ex: HttpExchange): Unit = {
    if (ex.getRequestMethod != "POST") { send(ex, 405, errJson("POST only")); return }
    var atTs: Option[Long] = None
    val key =
      try {
        val root = mapper.readTree(ex.getRequestBody)
        val t = root.get("ts_ms")
        if (t != null && t.isNumber) atTs = Some(t.asLong())
        val k = root.get("key")
        if (k == null || !k.isTextual) null else k.asText()
      } catch { case _: Exception => null }
    if (key == null) { send(ex, 400, errJson("body must be {\"key\": \"...\"}")); return }
    // live path: re-evaluate the window aggregates at the request's virtual
    // point from buffered rows (reference request semantics); fall back to
    // the last upserted feature row for keys with no buffer
    live.flatMap(_.eval(key, atTs)) match {
      case Some((at, feats)) =>
        send(ex, 200, featuresJson(key, at, feats, live = true))
      case None => store.get(key) match {
        case None => send(ex, 404, errJson(s"no features for key $key"))
        case Some(entry) =>
          send(ex, 200, featuresJson(key, entry.tsMs, entry.values.toSeq, live = false))
      }
    }
  }

  /** One response shape for both the live and the store-fallback path. */
  private def featuresJson(key: String, tsMs: Long,
                           feats: Seq[(String, Any)], live: Boolean): String = {
    val root = mapper.createObjectNode()
    root.put("key", key)
    root.put("ts_ms", tsMs)
    if (live) root.put("live", true)
    val fo = root.putObject("features")
    feats.sortBy(_._1).foreach { case (n, v) => putAny(fo, n, v) }
    mapper.writeValueAsString(root)
  }

  private def putAny(o: ObjectNode, n: String, v: Any): Unit = v match {
    case null                 => o.putNull(n)
    case d: java.lang.Double  => o.put(n, d.doubleValue())
    case f: java.lang.Float   => o.put(n, f.doubleValue())
    case l: java.lang.Long    => o.put(n, l.longValue())
    case i: java.lang.Integer => o.put(n, i.longValue())
    case b: java.lang.Boolean => o.put(n, b.booleanValue())
    case s                    => o.put(n, String.valueOf(s))
  }

  private def errJson(msg: String): String = {
    val root = mapper.createObjectNode()
    root.put("error", msg)
    mapper.writeValueAsString(root)
  }

  private def send(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    val os = ex.getResponseBody
    os.write(bytes); os.close()
  }
}
