package graft.streaming

import org.apache.spark.sql.SparkSession

/** Session-conf hygiene for the three state-store settings the streaming
  * engines touch. Spark resolves the state-store provider (and the RocksDB
  * auxiliary knobs) from the SESSION conf at query start, so a plan builder
  * that needs RocksDB (transformWithState requires column families — the
  * HDFS-backed default supports exactly one) has no choice but to mutate
  * session state before the query starts. Left unrestored, that mutation
  * silently changes the provider of every LATER streaming query in the
  * session — a spec documented as exercising the HDFS default would really
  * run on RocksDB (r13 ADVICE, StreamingDedup.scala:198).
  *
  * The contract: plan builders call [[setRocksDb]]; anything that runs a
  * bounded streaming query to completion (catalog entries, StreamVerify,
  * specs) wraps the build+run in [[withSaved]], which restores ALL THREE
  * keys — set or unset — to their entry values. Long-lived product paths
  * (api.Pipeline specs, WindowSql) cannot restore (the query outlives the
  * call) and instead document the session-level effect.
  */
object StateStoreConf {
  val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  val ChangelogKey =
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
  val TrackRowsKey =
    "spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows"
  val Keys: Seq[String] = Seq(ProviderKey, ChangelogKey, TrackRowsKey)

  val RocksDbProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  val HdfsProvider =
    "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"

  def snapshot(spark: SparkSession): Seq[(String, Option[String])] =
    Keys.map(k => k -> spark.conf.getOption(k))

  def restore(spark: SparkSession, saved: Seq[(String, Option[String])]): Unit =
    saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }

  /** Runs `f`, then restores the three state-store confs to their values on
    * entry — whatever `f` (or a TWS plan builder inside it) set. `f` must
    * both START and DRAIN/STOP any streaming query that depends on them:
    * the confs are consulted at query start, so restoring while a query
    * `f` launched is still running would be a different bug. */
  def withSaved[T](spark: SparkSession)(f: => T): T = {
    val saved = snapshot(spark)
    try f finally restore(spark, saved)
  }

  /** RocksDB provider + the two measured fast-commit knobs: changelog
    * checkpointing (commit the per-batch delta, snapshot in background)
    * and trackTotalNumberOfRows=false (exact per-store row counts cost a
    * get per put/delete and the engines never read them). */
  def setRocksDb(spark: SparkSession): Unit = {
    spark.conf.set(ProviderKey, RocksDbProvider)
    spark.conf.set(ChangelogKey, "true")
    spark.conf.set(TrackRowsKey, "false")
  }
}
