package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.GraftFunctions

/** Session bootstrap: scale-oriented defaults + the graft function family +
  * the driver testdata tables registered as temp views.
  *
  * The defaults are what we would ship for a real cluster: AQE on (runtime
  * re-planning, skew-join splitting, partition coalescing), shuffle
  * partitions sized for the local harness (on a 1000-executor cluster this
  * is set to ~2-3x total cores or left to AQE's coalescing).
  */
object GraftSession {

  val tables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings")

  def builder(master: String = "local[32]"): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // wide signature aggregates (MinHash's 128 min() columns, SimHash's
      // 60 vote columns) must stay inside whole-stage codegen; the default
      // cutoff (100 fields) silently drops them to interpreted evaluation
      .config("spark.sql.codegen.maxFields", "256")
      // broadcast from MEASURED shuffle sizes (AQE), never from Catalyst's
      // static size guesses: post-aggregate estimates are wildly off, which
      // both mis-broadcasts big intermediates (a driver-side OOM source at
      // scale) and plans BroadcastExchange over whole pipelines, re-running
      // them per join branch instead of reusing one materialized shuffle.
      // Streaming plans (no AQE) broadcast via explicit hints instead.
      // 8 MB: dimension tables and candidate-pair frames qualify; row-heavy
      // intermediates (e.g. a corpus's exploded shingle rows) never do —
      // their single-threaded hash-relation build costs more than the
      // shuffle they replace
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "8388608")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")

  def create(master: String = "local[32]"): SparkSession = {
    val spark = builder(master).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    prepare(spark, null)
    spark
  }

  /** Session -> last-prepared data dir ("" = functions only). Keyed by the
    * session object itself, so alternating dirs re-register the views and a
    * reused identity hash can never skip setup; registration still runs
    * once per (session, dir), so repeated catalog-query invocations don't
    * re-register 30 functions and re-read 10 parquet footers per call.
    */
  private val prepared =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, String]()

  /** Idempotent per-(session, dir) setup: register functions and, when a
    * data dir is given, each parquet table as a temp view.
    */
  def prepare(spark: SparkSession, dir: String): SparkSession = {
    val last = prepared.get(spark)
    if (last == null) {
      // events.ts is TIMESTAMP(NANOS) parquet, which Spark has no native type
      // for; read it as BIGINT nanos (queries derive ts_ms from it).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      GraftFunctions.register(spark)
    }
    if (dir != null && dir != last) {
      tables.foreach { t =>
        spark.read.parquet(s"$dir/$t.parquet").createOrReplaceTempView(t)
      }
      prepared.put(spark, dir)
    } else if (last == null) prepared.put(spark, "")
    spark
  }

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
