package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: which watermark filters LATE EVENTS in a microbatch —
  * the one updated from the immediately preceding batch (W_{j-1}) or the
  * one from a batch earlier (W_{j-2}, Spark 3.4+'s two-watermark split
  * where late-record filtering lags eviction by one batch)?
  *
  * Slices (one file each, maxFilesPerTrigger=1, delay 0):
  *   0: ts 100s                      -> after: W = 100s
  *   1: ts 10s, 200s                 -> after: W = 200s (10s row: filtered
  *      with W=0, kept either way... wait, batch 1 filter W0=100s? no:
  *      batch 1's "previous" is batch 0)
  *   2: ts 15s, 12s  (window [10,20) end=20s)
  *   3: ts 17s
  * If batch 2 filters with W after batch 1 (200s): 15/12 dropped -> [10,20) n=1
  * If batch 2 filters with W after batch 0 (100s): also dropped  -> n=1
  * If batch 2 filters with W=0 ... n=3.
  * Distinguish W_{j-1} vs W_{j-2} via slice 1's 10s row and slice 2:
  *   batch 1 under W_{j-1}=100s would DROP the 10s row (end 20 <= 100);
  *   under W_{j-2}=0 it keeps it.
  */
object WatermarkLagProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("wmprobe_").toString
    val in = s"$root/in"
    def slice(j: Int, ts: Seq[Long]): Unit = {
      ts.toDF("ts_ms").coalesce(1).write.mode("append").parquet(in)
      val fs = new java.io.File(in).listFiles().filter(_.isFile)
      fs.foreach { f =>
        if (f.lastModified() > System.currentTimeMillis() - 60000)
          () // leave newer ones alone; we stamp all below
      }
    }
    // write all slices, stamp mtimes in order
    val slices = Seq(Seq(100000L), Seq(10000L, 200000L), Seq(15000L, 12000L), Seq(17000L))
    val seen = scala.collection.mutable.Set.empty[String]
    val base = System.currentTimeMillis() - 20000
    slices.zipWithIndex.foreach { case (ts, j) =>
      ts.toDF("ts_ms").coalesce(1).write.mode("append").parquet(in)
      new java.io.File(in).listFiles().filter(f => f.isFile && !seen(f.getName))
        .foreach { f => f.setLastModified(base + j * 2000L); seen += f.getName }
    }
    val st = spark.readStream.schema(spark.read.parquet(in).schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
      .withColumn("ts", timestamp_millis(col("ts_ms")))
      .withWatermark("ts", "0 seconds")
    val out = st.groupBy(window(col("ts"), "10 seconds"))
      .agg(count(lit(1)).as("n"))
      .select(unix_millis(col("window.start")).as("ws"), col("n"))
    val q = out.writeStream.outputMode("append").format("parquet")
      .option("path", s"$root/out").option("checkpointLocation", s"$root/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0)).start()
    q.processAllAvailable()
    // flush
    Seq(4102444800000L).toDF("ts_ms").coalesce(1).write.mode("append").parquet(in)
    q.processAllAvailable()
    Seq(4102444801000L).toDF("ts_ms").coalesce(1).write.mode("append").parquet(in)
    q.processAllAvailable()
    q.stop()
    println("== result ==")
    spark.read.schema(out.schema).parquet(s"$root/out")
      .where(col("ws") < 4102444000000L).orderBy("ws").collect()
      .foreach(r => println(s"window_start=${r.getLong(0)} n=${r.getLong(1)}"))
    spark.stop()
  }
}
