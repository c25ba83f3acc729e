package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed batch-at-a-time per partition.
  *
  * The decode step is STUBBED (this container has no image/audio codecs):
  * `decodeStub` derives deterministic fake metadata from the bytes. The
  * Spark-side shape is real — binary schema, per-partition batched
  * processing (the Scala analogue of `mapInPandas`), explicit output
  * schema — so swapping in a real decoder is a one-function change.
  */
object Multimodal {

  /** Output schema of the decode stage. */
  val decodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("feature", ArrayType(DoubleType), nullable = false)))

  /** Deterministic fake decode: dimensions/format/feature vector derived
    * from the payload bytes. Replace with a real codec in production. */
  def decodeStub(bytes: Array[Byte]): (String, Int, Int, Array[Double]) = {
    val n = bytes.length
    val fmt = if (n % 3 == 0) "png" else if (n % 3 == 1) "jpeg" else "webp"
    val width = 16 + (n % 64)
    val height = 16 + ((n / 64) % 64)
    // 8-dim "embedding": byte-sum histogram over 8 strides, normalized
    val feat = new Array[Double](8)
    var i = 0
    while (i < n) { feat(i % 8) += (bytes(i) & 0xFF); i += 1 }
    (fmt, width, height, feat.map(v => if (n > 0) v / n else 0.0))
  }

  /** Batched per-partition decode over a (id, payload binary) frame —
    * the Scala analogue of mapInPandas: one iterator pass per partition,
    * no per-row task overhead, output schema declared up front.
    */
  def decode(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val rows = df.select(col(idCol).cast("long"), col(payloadCol))
    val enc = Encoders.row(decodedSchema)
    rows.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val (fmt, w, h, feat) = decodeStub(bytes)
        Row(id, bytes.length, fmt, w, h, feat.toSeq)
      }
    }(enc)
  }

  /** Frame-sampling stub for video-ish payloads: emits every `stride`-th
    * 1 KiB chunk as a "frame" with its offset — the partitioning/explode
    * shape of real frame extraction. */
  def sampleFrames(df: DataFrame, idCol: String, payloadCol: String,
                   stride: Int = 4): DataFrame = {
    val nChunks = ceil(octet_length(col(payloadCol)) / lit(1024.0)).cast("int")
    df.select(col(idCol), col(payloadCol),
        posexplode(sequence(lit(0), greatest(nChunks - 1, lit(0)), lit(stride))))
      .select(col(idCol), col("col").as("frame_idx"),
        col(payloadCol).substr(col("col") * 1024 + 1, lit(1024)).as("frame_bytes"))
  }
}
