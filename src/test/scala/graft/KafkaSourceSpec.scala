package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Kafka

/** Pins the reference-spec -> Spark option translation field by field
  * (the one residual risk the sandbox's broker-free testing leaves is
  * silent option-map drift) and the JSON value-decode path end-to-end
  * over a memory stream.
  */
class KafkaSourceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("option map: every reference spec field lands on its Spark option") {
    val full = Kafka.Spec(
      bootstrapServers = "b1:9092,b2:9092",
      topic = "events",
      offset = "Latest",
      groupId = Some("graft-g1"),
      clientConfigs = Map("security.protocol" -> "SASL_SSL",
        "sasl.mechanism" -> "PLAIN"),
      maxBatchRecords = Some(5000L))
    assert(Kafka.options(full) == Map(
      "kafka.bootstrap.servers" -> "b1:9092,b2:9092",
      "subscribe" -> "events",
      "startingOffsets" -> "latest",
      "kafka.group.id" -> "graft-g1",
      "maxOffsetsPerTrigger" -> "5000",
      "kafka.security.protocol" -> "SASL_SSL",
      "kafka.sasl.mechanism" -> "PLAIN"))

    // minimal spec: exactly the three required options, nothing extra
    assert(Kafka.options(Kafka.Spec("b:9092", "t")) == Map(
      "kafka.bootstrap.servers" -> "b:9092",
      "subscribe" -> "t",
      "startingOffsets" -> "earliest"))

    // Group offsets: no Spark equivalent — earliest + group id (resume
    // comes from the Spark checkpoint), the documented mapping
    val group = Kafka.options(Kafka.Spec("b:9092", "t", offset = "Group",
      groupId = Some("g")))
    assert(group("startingOffsets") == "earliest")
    assert(group("kafka.group.id") == "g")
  }

  test("decode: JSON values -> typed rows; malformed rows null-fill, not crash") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType)))
    val mem = MemoryStream[String]
    val out = Kafka.decode(mem.toDF().toDF("value"), schema)
    val q = out.writeStream.format("memory").queryName("kafka_decode")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      mem.addData(
        """{"id": 1, "name": "a", "score": 0.5}""",
        """{"id": 2, "name": null, "score": 2.25}""",
        """not json at all""")
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("kafka_decode")
      .collect().map(r => (Option(r.get(0)), Option(r.get(1)), Option(r.get(2)))).toSet
    assert(rows == Set(
      (Some(1L), Some("a"), Some(0.5)),
      (Some(2L), None, Some(2.25)),
      (None, None, None))) // malformed -> null row, stream keeps running
  }
}
