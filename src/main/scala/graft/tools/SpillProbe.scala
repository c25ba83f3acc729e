package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Batch-side memory-pressure probe (VERDICT r14 stretch #9, batch half):
  * the streaming ladder answers "what happens when STATE outgrows the
  * heap" (heap-resident HDFS provider vs off-heap RocksDB); this answers
  * the batch question — does a shuffle-heavy plan DEGRADE via Spark's
  * external sort/aggregation spill, or fall over? Runs a deliberately
  * memory-hungry shape over a parquet table — a wide multi-column sort
  * feeding a high-cardinality aggregation with per-key collect_set, the
  * canonical UnsafeExternalSorter pressure pattern — and reports wall
  * time plus the task-metric spill counters ([[graft.Metrics.SpillStats]]).
  * Driven by a descending SPARK_DRIVER_MEM ladder (scripts/spill_probe.sh
  * batch leg); the curve wall(heap) with spilled-bytes beside it is the
  * graceful-degradation record.
  *
  * Usage: runMain graft.tools.SpillProbe <sfDir> <outJson>
  */
object SpillProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outJson = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-spill-probe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val spill = graft.Metrics.collectSpill(spark)

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val t0 = System.nanoTime()
    // sort-within-partitions by a wide key (forces the full row through
    // the external sorter), then a high-cardinality groupBy whose
    // collect_set buffers force hash-aggregate fallback to sort-based
    // under pressure
    val shaped = li
      .repartition(8, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey", "l_partkey", "l_suppkey", "l_shipdate")
      .groupBy("l_orderkey")
      .agg(
        collect_set(col("l_partkey")).as("parts"),
        sum(col("l_extendedprice")).as("rev"),
        count(lit(1)).as("n"))
      .select(
        count(lit(1)).as("groups"),
        sum(size(col("parts"))).as("distinct_parts"),
        sum(col("rev")).as("rev_total"),
        sum(col("n")).as("rows"))
    val row = shaped.collect()(0)
    val wallSec = (System.nanoTime() - t0) / 1e9
    // let async listener events land before snapshotting
    Thread.sleep(1500)
    val mem = spill.snapshot

    val out = graft.Metrics.toJson(Map[String, Any](
      "tool" -> "graft.tools.SpillProbe",
      "sf" -> sfDir,
      "wall_sec" -> f"$wallSec%.1f".toDouble,
      "groups" -> row.getLong(0),
      "distinct_parts" -> row.getLong(1),
      "rows" -> row.getLong(3),
      "memory" -> mem))
    Files.write(Paths.get(outJson), out.getBytes("UTF-8"))
    println(out)
    spark.stop()
  }
}
