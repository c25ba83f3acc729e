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
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")

  def create(master: String = "local[32]"): SparkSession = {
    val spark = builder(master).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    prepare(spark, null)
    spark
  }

  /** (session identity, dir) pairs already prepared — registration runs
    * once per pair, so repeated catalog-query invocations don't re-register
    * 30 functions and re-read 10 parquet footers per call.
    */
  private val prepared =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(Int, String)]()

  /** Idempotent per-(session, dir) setup: register functions and, when a
    * data dir is given, each parquet table as a temp view.
    */
  def prepare(spark: SparkSession, dir: String): SparkSession = {
    val key = (System.identityHashCode(spark), if (dir == null) "" else dir)
    if (prepared.add(key)) {
      // events.ts is TIMESTAMP(NANOS) parquet, which Spark has no native type
      // for; read it as BIGINT nanos (queries derive ts_ms from it).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      GraftFunctions.register(spark)
      if (dir != null) {
        tables.foreach { t =>
          spark.read.parquet(s"$dir/$t.parquet").createOrReplaceTempView(t)
        }
      }
    }
    spark
  }

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
