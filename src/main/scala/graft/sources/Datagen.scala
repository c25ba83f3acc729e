package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Rate-limited synthetic source, mirroring the reference's datagen source
  * field generators (src/runtime/functions/source/datagen_source.rs:71-92):
  * IncrementalTimestamp, ProcessingTimestamp, Key{num_unique}, Increment,
  * Uniform{min,max}, Values (round-robin), String.
  *
  * Built on Spark's `rate` source: offsets are the rate source's offsets,
  * so checkpoint/replay come for free (the reference implements replayable
  * positions by hand — datagen_source.rs:94-106).
  */
object Datagen {

  sealed trait Field
  /** Event time = startMs + rowIndex * stepMs. */
  final case class IncrementalTimestamp(startMs: Long, stepMs: Long) extends Field
  /** Wall-clock at generation. */
  case object ProcessingTimestamp extends Field
  /** Cycling key space: "key_0" .. "key_{n-1}". */
  final case class Key(numUnique: Int) extends Field
  /** Monotonic row index. */
  case object Increment extends Field
  /** Deterministic pseudo-uniform double in [min, max) (seeded by row index). */
  final case class Uniform(min: Double, max: Double) extends Field
  /** Round-robin over fixed values. */
  final case class Values(values: Seq[String]) extends Field
  /** Fixed-prefix string + row index. */
  final case class Str(prefix: String) extends Field

  /** Streaming frame with one column per field spec. */
  def stream(spark: SparkSession, rowsPerSecond: Long, fields: Map[String, Field]): DataFrame = {
    val base = spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond).load() // (timestamp, value)
    withFields(base, fields)
  }

  /** Bounded batch frame (for tests/benchmarks): numRows rows. */
  def batch(spark: SparkSession, numRows: Long, fields: Map[String, Field]): DataFrame = {
    val base = spark.range(numRows).select(
      current_timestamp().as("timestamp"), col("id").as("value"))
    withFields(base, fields)
  }

  private def withFields(base: DataFrame, fields: Map[String, Field]): DataFrame = {
    val idx = col("value") // monotonically increasing row index from rate/range
    val cols = fields.toSeq.map { case (name, f) =>
      val c = f match {
        case IncrementalTimestamp(start, step) => lit(start) + idx * lit(step)
        case ProcessingTimestamp               => unix_millis(current_timestamp())
        case Key(n)                            => concat(lit("key_"), pmod(idx, lit(n.toLong)).cast("string"))
        case Increment                         => idx
        case Uniform(mn, mx) =>
          lit(mn) + (pmod(xxhash64(idx), lit(1000000L)).cast("double") / 1e6) * lit(mx - mn)
        case Values(vs) =>
          element_at(array(vs.map(lit): _*), (pmod(idx, lit(vs.size.toLong)) + 1).cast("int"))
        case Str(prefix)                       => concat(lit(prefix), idx.cast("string"))
      }
      c.as(name)
    }
    base.select(cols: _*)
  }
}
