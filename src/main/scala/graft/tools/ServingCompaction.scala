package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.serving.{RequestServer => _, _}

/** Long-run serving-store compaction economics (r14 VERDICT #6): the
  * concurrent-read bench proved reads hold for a 4-second window; a
  * long-lived store cares about the steady state — how many bytes does
  * the bitcask REWRITE per byte ingested, does the on-disk size stay
  * proportional to live keys, and does lookup latency hold as
  * generations pile up.
  *
  * `runMain graft.tools.ServingCompaction <out.json> [batches=120]
  *   [rowsPerBatch=20000] [keys=50000] [shards=8] [compactKiB=4096]`
  *
  * Drives the REAL executor write path ([[ShardedFeatureStore.upsertBatch]]
  * — hash-partitioned, one task per shard, append + threshold compaction)
  * for `batches` update-heavy micro-batches whose key window slides over
  * a fixed universe, sampling every 10 batches:
  * bytes appended / compaction read / compaction written (the
  * [[ShardLog]] counters), on-disk log bytes, live keys, and lookup
  * p50/p99 over random present keys.
  *
  * The number to watch is write amplification
  * `(appended + compactWritten) / appended`. For a bitcask with live set
  * L bytes and threshold T, each compaction rewrites ~L after (T - L)
  * fresh bytes, so steady-state WA ≈ 1 + L / (T - L): the knob POLICY is
  * compactBytes ≈ 2-4x the live per-shard bytes, paying WA ~1.3-2 for
  * disk bounded at T per shard. The artifact records the measured WA
  * beside this prediction so the policy is checkable, not asserted.
  */
object ServingCompaction {

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("BENCH_serving_compaction.json")
    val batches = args.lift(1).map(_.toInt).getOrElse(120)
    val rowsPerBatch = args.lift(2).map(_.toInt).getOrElse(20000)
    val keys = args.lift(3).map(_.toInt).getOrElse(50000)
    val shards = args.lift(4).map(_.toInt).getOrElse(8)
    val compactBytes = args.lift(5).map(_.toLong).getOrElse(4096L) * 1024L

    val spark = GraftSession.create(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
    val root = GraftSession.tempDir("graft_compact_econ_")
    val store = new ShardedFeatureStore(root, shards)
    val rnd = new scala.util.Random(42)

    def logBytes(): Long =
      (0 until shards).map { s =>
        ShardLog.shardDir(root, s).resolve("data.log").toFile.length()
      }.sum

    def lookupSample(n: Int, maxKeySeen: Long): (Long, Long, Int) = {
      val lats = (0 until n).map { _ =>
        val k = s"key_${rnd.nextLong(math.max(1L, math.min(maxKeySeen, keys.toLong)))}"
        val t0 = System.nanoTime()
        val hit = store.get(k).isDefined
        (System.nanoTime() - t0, hit)
      }
      val sorted = lats.map(_._1).sorted
      def pct(p: Double): Long =
        if (sorted.isEmpty) -1L else sorted(math.min(sorted.size - 1, (sorted.size * p).toInt))
      (pct(0.5), pct(0.99), lats.count(_._2))
    }

    val samples = scala.collection.mutable.ArrayBuffer.empty[String]
    val t0 = System.nanoTime()
    (0 until batches).foreach { b =>
      // sliding update-heavy window over the key universe: every batch
      // UPDATES rowsPerBatch keys, revisiting each key ~every
      // keys/rowsPerBatch batches — log growth is pure update volume
      val batch = spark.range(rowsPerBatch.toLong).select(
        concat(lit("key_"),
          pmod(col("id") + lit(b.toLong * rowsPerBatch), lit(keys.toLong))
            .cast("string")).as("key"),
        (lit(b.toLong * rowsPerBatch) + col("id")).as("ts_ms"),
        (pmod(xxhash64(col("id") + lit(b.toLong)), lit(1000000L)).cast("double") / 1e6).as("score"),
        concat(lit("payload_"), lpad(col("id").cast("string"), 64, "x")).as("blob"))
      ShardedFeatureStore.upsertBatch(root, shards, "key", "ts_ms",
        compactBytes)(batch, b.toLong)

      if ((b + 1) % 10 == 0 || b == batches - 1) {
        val maxKey = math.min((b.toLong + 1) * rowsPerBatch, keys.toLong)
        val (p50, p99, hits) = lookupSample(300, maxKey)
        val app = ShardLog.bytesAppended.sum()
        val cw = ShardLog.bytesCompactWritten.sum()
        val cr = ShardLog.bytesCompactRead.sum()
        val nc = ShardLog.compactions.sum()
        val disk = logBytes()
        val live = store.size
        samples += f"""{"batch":${b + 1},"bytes_appended":$app,"bytes_compact_read":$cr,"bytes_compact_written":$cw,"compactions":$nc,"disk_log_bytes":$disk,"live_keys":$live,"write_amplification":${(app + cw).toDouble / app}%.3f,"lookup_p50_ms":${p50 / 1e6}%.3f,"lookup_p99_ms":${p99 / 1e6}%.3f,"lookup_hits":$hits}"""
        System.err.println(s"[compact-econ] ${samples.last}")
      }
    }
    val wallSec = (System.nanoTime() - t0) / 1e9

    val app = ShardLog.bytesAppended.sum()
    val cw = ShardLog.bytesCompactWritten.sum()
    val nc = ShardLog.compactions.sum()
    val disk = logBytes()
    val live = store.size
    // the policy prediction: live bytes per shard from the last
    // compaction output (cw / nc approximates the steady live image)
    val liveBytesPerShard = if (nc > 0) cw / nc else disk / shards
    val predictedWa =
      1.0 + liveBytesPerShard.toDouble /
        math.max(1.0, (compactBytes - liveBytesPerShard).toDouble)
    val json =
      f"""{"tool":"ServingCompaction","batches":$batches,"rows_per_batch":$rowsPerBatch,"key_universe":$keys,"shards":$shards,"compact_bytes":$compactBytes,"wall_sec":$wallSec%.1f,"rows_ingested":${batches.toLong * rowsPerBatch},"bytes_appended":$app,"bytes_compact_written":$cw,"compactions":$nc,"write_amplification":${(app + cw).toDouble / app}%.3f,"predicted_wa_formula":"1 + L/(T-L)","predicted_wa":$predictedWa%.3f,"live_bytes_per_shard_est":$liveBytesPerShard,"final_disk_log_bytes":$disk,"final_live_keys":$live,
"samples":[
${samples.mkString(",\n")}
]}
"""
    Files.writeString(Paths.get(out), json)
    System.err.println(s"[compact-econ] wrote $out")
    spark.stop()
  }
}
