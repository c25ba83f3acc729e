package graft.serving

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Last-write-wins keyed in-memory feature store — the reference's upsert
  * in-memory storage sink (src/runtime/functions/sink/
  * in_memory_storage_sink.rs:139-150: explode rows, upsert into a keyed
  * map by the configured key columns, last write wins).
  *
  * The store lives on the driver and serves HTTP lookups ([[RequestServer]]);
  * the reference likewise ships sink batches to a single in-memory storage
  * server over gRPC. On a production cluster the same `foreachBatch` hook
  * targets an external KV / Delta MERGE instead — the store is the
  * serving-parity and test path, not the 100 TB state backend.
  */
final class FeatureStore extends FeatureLookup {

  private val m = new ConcurrentHashMap[String, FeatureStore.Entry]()

  /** Upsert, last-write-wins by event time (ties: later call wins). */
  def upsert(key: String, tsMs: Long, values: Map[String, Any]): Unit =
    m.merge(key, FeatureStore.Entry(tsMs, values),
      (old, nw) => if (nw.tsMs >= old.tsMs) nw else old)

  override def get(key: String): Option[FeatureStore.Entry] = Option(m.get(key))
  override def size: Int = m.size
  override def keys: Seq[String] =
    { import scala.jdk.CollectionConverters._; m.keySet.asScala.toSeq }
}

/** What the HTTP serving layer needs from a feature store — implemented
  * by the driver-map [[FeatureStore]] (serving-parity/test path) and the
  * scale path [[ShardedFeatureStore]] (key-routed per-shard logs).
  */
trait FeatureLookup {
  def get(key: String): Option[FeatureStore.Entry]
  def size: Int
  def keys: Seq[String]
}

object FeatureStore {

  /** One stored feature row: the event time it was computed at + the
    * feature columns (name -> value). */
  final case class Entry(tsMs: Long, values: Map[String, Any])

  /** `foreachBatch` upsert sink. Each micro-batch is reduced to one row
    * per key IN SPARK (max event time wins) before the driver sees it, so
    * driver transfer is O(distinct keys), not O(rows); the reference's
    * sink upserts row-by-row in batch order, which for (ts, seq)-ordered
    * window emissions is the same last-write-wins outcome. When the batch
    * carries the engine's `__seq` emission ordinal it breaks same-ts ties
    * (deterministic last-write-wins in emission order, matching the
    * reference's row-by-row batch-order upsert); `__seq` is consumed here
    * and not stored.
    */
  def upsertBatch(store: FeatureStore, keyCol: String, tsCol: String)
                 (batch: DataFrame, batchId: Long): Unit = {
    if (!batch.isEmpty) {
      val hasSeq = batch.schema.fieldNames.contains("__seq")
      val ord =
        if (hasSeq) Seq(col(tsCol).desc, col("__seq").desc)
        else Seq(col(tsCol).desc)
      val w = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
      val latest = batch.withColumn("__rn", row_number().over(w))
        .where(col("__rn") === 1).drop("__rn")
      val names = latest.schema.fieldNames
      latest.collect().foreach { r =>
        val key = String.valueOf(r.getAs[Any](keyCol))
        val ts = r.getAs[Number](tsCol).longValue()
        val values = names.iterator.filter(n => n != keyCol && n != "__seq")
          .map(n => n -> r.getAs[Any](n)).toMap
        store.upsert(key, ts, values)
      }
    }
  }
}
