package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Kafka source wiring, mirroring the reference's Kafka source spec 1:1
  * (src/runtime/functions/source/kafka/mod.rs:22-41: bootstrap_servers,
  * topic, group_id, offset Earliest/Latest/Group, client_configs,
  * max_batch_records) onto Spark's built-in `kafka` streaming source.
  *
  * The reference JSON-decodes each record's value against the declared
  * Arrow schema (kafka/mod.rs:70+); here that is `from_json` against the
  * declared StructType — the decode path is shared with tests that feed a
  * memory-stream stand-in through [[decode]], so the transform is
  * exercised without a broker.
  *
  * Broker-backed integration (the reference's testcontainers suite,
  * kafka/integration_tests.rs) is NOT runnable in this build sandbox —
  * verified r11: no kafka broker/client artifacts exist anywhere on the
  * box (`find / -iname "*kafka*.jar"` is empty — neither kafka_2.13 for
  * an embedded KRaft broker nor even spark-sql-kafka for the connector
  * itself), and dependency resolution is offline. [[stream]] compiles
  * against the stable `format("kafka")` string-and-options surface, so
  * it runs unchanged on any real deployment where the standard
  * spark-sql-kafka-0-10 package is on the classpath; [[options]] +
  * [[decode]] (the parts with graft-specific logic) are what the
  * broker-free spec pins.
  */
object Kafka {

  final case class Spec(
      bootstrapServers: String,
      topic: String,
      offset: String = "Earliest", // Earliest | Latest | Group
      groupId: Option[String] = None,
      clientConfigs: Map[String, String] = Map.empty,
      maxBatchRecords: Option[Long] = None)

  /** Reference spec -> Spark kafka-source options, mapped 1:1.
    * `Group` offsets (resume from the committed group offset) have no
    * Spark equivalent — Spark tracks progress in its own checkpoint — so
    * Group maps to `earliest` + `kafka.group.id`, which with a checkpoint
    * dir gives the same resume-where-you-left-off behavior.
    */
  def options(spec: Spec): Map[String, String] = {
    val base = Map(
      "kafka.bootstrap.servers" -> spec.bootstrapServers,
      "subscribe" -> spec.topic,
      "startingOffsets" -> (spec.offset match {
        case "Latest" => "latest"
        case _        => "earliest"
      }))
    val group = spec.groupId.map(g => "kafka.group.id" -> g)
    val cap = spec.maxBatchRecords.map(n => "maxOffsetsPerTrigger" -> n.toString)
    val client = spec.clientConfigs.map { case (k, v) => s"kafka.$k" -> v }
    base ++ group ++ cap ++ client
  }

  /** Streaming frame of decoded rows from a Kafka topic. */
  def stream(spark: SparkSession, spec: Spec, schema: StructType): DataFrame =
    decode(spark.readStream.format("kafka").options(options(spec)).load(), schema)

  /** JSON value decode against the declared schema (the reference's
    * per-record JSON -> Arrow decode). Input needs a `value` column
    * (binary or string). */
  def decode(raw: DataFrame, schema: StructType): DataFrame =
    raw.select(from_json(col("value").cast("string"), schema).as("__r"))
      .select(col("__r.*"))
}
