package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.TimeUnit

import org.scalatest.funsuite.AnyFunSuite

import graft.tools.ClusterProbe

/** Runs [[graft.tools.ClusterProbe]] — representative catalog entries on
  * `local-cluster[2,2,1024]` (real forked executor JVMs) diffed against a
  * single-JVM `local[4]` oracle — in its own forked JVM, and asserts:
  *
  *  1. two executor JVMs registered and ran tasks, neither of them the
  *     driver process (so task closures, TypedImperativeAggregate
  *     buffers, and streaming state codecs really crossed process
  *     boundaries);
  *  2. every probed entry produced identical answers on both masters;
  *  3. the sharded feature store's shard logs were written by executor
  *     pids (writer.pid sidecars), never by the driver, and driver-side
  *     lookups served last-write-wins truth from those logs.
  *
  * Forked because a local-cluster SparkContext cannot share a JVM with
  * the suite's local[*] context. The probe JVM gets SPARK_HOME and a
  * scratch SPARK_WORKER_DIR via env — the standalone Worker needs them
  * to assemble the executor launch command.
  */
class LocalClusterSpec extends AnyFunSuite {

  test("catalog entries are answer-identical across real executor-JVM " +
       "boundaries (local-cluster[2,2,1024])") {
    ClusterProbe.entryNames.foreach(n =>
      assert(SparkEntry.queries.contains(n), s"probe entry $n not in catalog"))

    val root = GraftSession.tempDir("graft_cluster_spec_")
    val outJson = Paths.get(root, "probe.json")
    val errFile = Paths.get(root, "probe_err.txt").toFile
    val outFile = Paths.get(root, "probe_out.txt").toFile
    val javaBin = Paths.get(System.getProperty("java.home"), "bin", "java").toString
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).map(p => s"--add-opens=$p=ALL-UNNAMED")
    val cmd = (Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx4g", "-Duser.timezone=UTC",
      "-cp", System.getProperty("java.class.path"),
      "graft.tools.ClusterProbe",
      "/root/testdata/sf0.001", outJson.toString))
    val pb = new ProcessBuilder(cmd: _*)
    pb.environment().put("SPARK_HOME", "/opt/spark")
    // spark-class normally exports this via load-spark-env.sh; the
    // in-JVM Worker's executor command builder requires it to locate
    // the jars dir without a dev-build layout
    pb.environment().put("SPARK_SCALA_VERSION", "2.13")
    pb.environment().put("SPARK_WORKER_DIR", Paths.get(root, "work").toString)
    pb.environment().put("SPARK_LOG_DIR", Paths.get(root, "logs").toString)
    pb.environment().put("SPARK_LOCAL_IP", "127.0.0.1")
    pb.redirectOutput(outFile)
    pb.redirectError(errFile)
    val proc = pb.start()
    val finished = proc.waitFor(15, TimeUnit.MINUTES)
    if (!finished) proc.destroyForcibly()
    def tail(f: java.io.File): String = {
      val s = try new String(Files.readAllBytes(f.toPath)) catch { case _: Exception => "" }
      s.takeRight(4000)
    }
    assert(finished, s"probe JVM did not finish; stderr tail:\n${tail(errFile)}")
    assert(proc.exitValue() == 0,
      s"probe JVM exited ${proc.exitValue()}; stderr tail:\n${tail(errFile)}")
    assert(Files.exists(outJson), s"no probe report; stderr tail:\n${tail(errFile)}")

    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(Files.readAllBytes(outJson))
    val report = node.toPrettyString

    assert(node.get("failures").size() == 0, s"probe failures: $report")

    // 1. real multi-JVM execution
    val driverPid = node.get("driver_pid").asLong()
    assert(node.get("distinct_executor_jvms").asInt() >= 2,
      s"expected >=2 executor JVMs: $report")
    assert(!node.get("driver_ran_tasks").asBoolean(),
      s"driver JVM ran tasks — not a cluster-mode run: $report")

    // 2. answer parity per entry
    ClusterProbe.entryNames.foreach { name =>
      val e = node.get("entries").get(name)
      assert(e != null, s"entry $name missing from report: $report")
      assert(e.get("cluster_rows").asInt() > 0,
        s"$name returned no rows on the cluster: $report")
      assert(e.get("equal").asBoolean(),
        s"$name differs between local-cluster and local[4]: $report")
    }

    // 3. executor-written shard logs, driver-side LWW truth
    val store = node.get("store")
    assert(store.get("lookup_errors").asInt() == 0,
      s"store lookups wrong: $report")
    assert(store.get("writer_pids").size() > 0, s"no writer pids: $report")
    store.get("writer_pids").forEach(p =>
      assert(p.asLong() != driverPid,
        s"shard log written by the driver JVM: $report"))
    assert(store.get("writers_all_executors").asBoolean(),
      s"writer pids not all registered executor JVMs: $report")
  }
}
