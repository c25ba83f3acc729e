package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.{GraftSession, SparkEntry}

/** Wall-clock bench across REAL executor-JVM boundaries (VERDICT r15 #6):
  * `CLUSTER_FULL.json` proves answer parity on `local-cluster[2,2]` but
  * never times it — serialization and shuffle-path costs (task-result
  * round-trips, TypedImperativeAggregate buffer encode/decode between
  * partial and final, state-store setup per forked JVM) are invisible in
  * `local[N]` where everything shares one heap. This tool times the
  * heaviest catalog entries on `local-cluster[2,2,2048]` (2 forked
  * executor JVMs × 2 cores) and on `local[4]` (same core count, one JVM)
  * and records per-entry ratios.
  *
  * Timing discipline: each entry runs TWICE per master; the FIRST run on
  * a fresh cluster JVM pays executor-side JIT/codegen that the
  * long-lived local JVM may already have amortized, so the committed
  * ratio compares STEADY (second) runs — both raw numbers stay in the
  * record. Entry selection is data-driven: the top-N seconds from the
  * committed clean series record (`BENCH_local.json` queries map), so
  * the list tracks whatever is currently expensive instead of a stale
  * hand copy.
  *
  * Usage: runMain graft.tools.ClusterBench [sfDir] [out.json] [topN]
  */
object ClusterBench {

  /** --add-opens set the forked executor JVMs need (same as the test
    * fork / ClusterProbe). */
  private def addOpens: Seq[String] = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar")
    .map(p => s"--add-opens=$p=ALL-UNNAMED")

  private def topEntries(refPath: String, n: Int): Seq[(String, Double)] = {
    val txt = new String(Files.readAllBytes(Paths.get(refPath)), StandardCharsets.UTF_8)
    // shared parser (ADVICE r16): fails loudly if the record format ever
    // nests an object inside `queries`, instead of selecting wrong entries
    graft.Metrics.parseQueriesMap(txt).toSeq
      .filter(_._2 > 0).sortBy(-_._2).take(n)
  }

  private def timeTwice(spark: SparkSession, sfDir: String, name: String)
      : (Double, Double) = {
    def once(): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    val first = once(); val steady = once()
    (first, steady)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val out = args.lift(1).getOrElse("CLUSTER_BENCH.json")
    val topN = args.lift(2).map(_.toInt).getOrElse(20)
    val ref = sys.env.getOrElse("SPARK_GRAFT_BENCH_REF", "/root/repo/BENCH_local.json")
    val entries = topEntries(ref, topN)
    System.err.println(s"[cbench] ${entries.size} entries: " +
      entries.map(e => f"${e._1}=${e._2}%.1fs").mkString(", "))

    def jstr(s: String): String = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

    // contamination stamps, same discipline as the main bench record
    val calib0 = graft.MachineHealth.score()
    val io0 = graft.MachineHealth.ioScore()

    def sweep(spark: SparkSession, label: String): Seq[(String, Double, Double)] = {
      spark.sparkContext.setLogLevel("WARN")
      GraftSession.prepare(spark, sfDir)
      // same warm count the bench uses so file listing doesn't bill to
      // the first entry
      spark.sql("SELECT count(*) FROM events WHERE value > 0").collect()
      entries.map { case (name, _) =>
        val (f, s) = timeTwice(spark, sfDir, name)
        System.err.println(f"[cbench] $label $name first=$f%.2f steady=$s%.2f")
        println(f"""{"m":${jstr(label)},"q":${jstr(name)},"first":$f%.3f,"steady":$s%.3f}""")
        (name, f, s)
      }
    }

    // ---- phase 1: local-cluster[2,2,2048] — 2 forked executor JVMs ----
    val cp = System.getProperty("java.class.path")
    val cluster = GraftSession.builder("local-cluster[2,2,2048]")
      .config("spark.executor.extraClassPath", cp)
      .config("spark.executor.extraJavaOptions",
        (addOpens :+ "-Duser.timezone=UTC").mkString(" "))
      .config("spark.executor.memory", "2048m")
      // 8 = 2x total cores: enough parallelism per stage without paying
      // 32 state-store commits per trigger on a 4-core cluster
      .config("spark.sql.shuffle.partitions", "8")
      .getOrCreate()
    val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
    while (cluster.sparkContext.statusTracker.getExecutorInfos.length < 3 &&
           System.nanoTime() < deadline) Thread.sleep(200)
    require(cluster.sparkContext.statusTracker.getExecutorInfos.length >= 3,
      "executors did not register within 120s")
    val clusterTimes = sweep(cluster, "cluster")
    cluster.stop()

    // ---- phase 2: local[4] — same core count, single JVM --------------
    val local = GraftSession.builder("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .getOrCreate()
    val localTimes = sweep(local, "local4")
    local.stop()

    val calib1 = graft.MachineHealth.score()
    val io1 = graft.MachineHealth.ioScore()

    val lt = localTimes.map(t => t._1 -> t).toMap
    val rows = clusterTimes.map { case (name, cf, cs) =>
      val (_, lf, ls) = lt(name)
      f"""${jstr(name)}:{"cluster_first":$cf%.3f,"cluster_steady":$cs%.3f,"local4_first":$lf%.3f,"local4_steady":$ls%.3f,"ratio_steady":${cs / ls}%.2f}"""
    }
    val worst = clusterTimes.map { case (n, _, cs) => (n, cs / lt(n)._3) }
      .sortBy(-_._2)
    val json =
      f"""{
"tool": "graft.tools.ClusterBench",
"what": "wall-clock of the top-$topN committed-series entries on local-cluster[2,2,2048] (2 forked executor JVMs, 4 cores) vs local[4] (same cores, 1 JVM); ratio compares STEADY (second) runs so fresh-JVM JIT does not bill to the shuffle path",
"sf_dir": ${jstr(sfDir)},
"shuffle_partitions": 8,
"calibration": {"start": $calib0%.1f, "end": $calib1%.1f},
"calibration_io": {"start": $io0%.1f, "end": $io1%.1f},
"worst_ratios": ${worst.take(5).map { case (n, r) => f"${jstr(n)}:$r%.2f" }.mkString("{", ",", "}")},
"entries": ${rows.mkString("{\n", ",\n", "\n}")}
}
"""
    Files.writeString(Paths.get(out), json)
    System.err.println(s"[cbench] wrote $out")
  }
}
