package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.TimeUnit

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.serving.{ReaderProbe, ShardedFeatureStore}

/** The shard-log design claim is that writer (Spark tasks) and reader
  * (serving node) share nothing but the log files, "so the two sides can
  * be different JVMs / machines" — the reference's serving split is
  * process-level (volga-worker processes queried over gRPC). Every other
  * spec exercises both sides in ONE JVM, where a shared page cache and
  * JVM-level happens-before can mask protocol holes; this one forks a
  * REAL second JVM ([[graft.serving.ReaderProbe]] via `java -cp`) that
  * reads the logs while this JVM's Spark job concurrently upserts and
  * compacts them, and asserts the reader observed last-write-wins truth
  * through dozens of compactions.
  */
class CrossJvmServingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("a forked reader JVM observes LWW truth through concurrent compactions") {
    import spark.implicits._
    val root = GraftSession.tempDir("graft_xjvm_")
    val nKeys = 4
    val batches = 40

    // fork the reader with the SAME classpath this (forked) test JVM
    // got from sbt — no Spark session starts over there, the probe only
    // loads the serving classes
    val javaBin = Paths.get(System.getProperty("java.home"), "bin", "java").toString
    val outFile = Paths.get(root, "probe_out.json").toFile
    val errFile = Paths.get(root, "probe_err.txt").toFile
    val pb = new ProcessBuilder(javaBin, "-cp",
      System.getProperty("java.class.path"),
      "graft.serving.ReaderProbe", "check", root, "1", nKeys.toString)
    pb.redirectOutput(outFile)
    pb.redirectError(errFile)
    val proc = pb.start()

    def upsert(ts: Long): Unit =
      // compactBytes=1 → every append trips the threshold: the reader
      // lives through a compaction per batch, not one lucky rewrite
      ShardedFeatureStore.upsertBatch(root, 1, "key", "ts_ms", compactBytes = 1L)(
        (0 until nKeys).map(k => (s"k$k", ts, ts * 10.0 + k)).toDF("key", "ts_ms", "f"),
        0L)

    try {
      (1 to batches).foreach { g =>
        upsert(g.toLong)
        Thread.sleep(15) // let the reader interleave lookups between rewrites
      }
      // an out-of-order older batch must not move served truth backwards
      upsert(5L)
    } finally ReaderProbe.requestStop(root)

    assert(proc.waitFor(60, TimeUnit.SECONDS),
      s"reader JVM did not exit; stderr: ${new String(Files.readAllBytes(errFile.toPath))}")
    assert(proc.exitValue() == 0,
      s"reader JVM failed; stderr: ${new String(Files.readAllBytes(errFile.toPath))}")

    val out = new String(Files.readAllBytes(outFile.toPath)).trim
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(out)
    assert(node.get("violations").asLong() == 0L,
      s"ts went backwards in the reader: $out")
    assert(node.get("value_violations").asLong() == 0L,
      s"reader served a value inconsistent with its ts: $out")
    assert(node.get("hits").asLong() > 0L, s"reader never hit a key: $out")
    // the reader itself observed at least one compaction generation
    assert(node.get("gen").asLong() >= 1L, s"no compaction observed: $out")
    // ...and its final pass (after the stop marker, i.e. after the last
    // upsert returned) served the newest write for every key — the
    // out-of-order ts=5 batch did not clobber it
    (0 until nKeys).foreach { k =>
      assert(node.get("final_ts").get(s"k$k").asLong() == batches.toLong,
        s"key k$k final ts: $out")
    }
    // sanity from this side: the log really was compacted many times
    assert(ShardedFeatureStore.genOf(root, 0) >= batches.toLong)
  }
}
