package graft.serving

import java.io.RandomAccessFile
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Feature store SHARDED off the driver — the scale-out form of
  * [[FeatureStore]]'s driver map, shaped like the reference's serving
  * path: sink batches are routed to per-shard storage by a hash of the
  * key (the reference's RequestRoute partition strategy,
  * src/runtime/partition.rs:131-152 — `hash(key) % num_workers` picks
  * the worker owning that key's state), and a lookup touches exactly one
  * shard.
  *
  * Layout: `root/shard-NNNNN/data.log`, an append-only record log per
  * shard (bitcask shape), speaking the [[ShardLog]] protocol — the ONE
  * implementation of framing, torn-tail stop, gen fence and compaction
  * shared with [[ShardedServingBuffer]] (the round-8 mirrored copies are
  * gone). Upserts run INSIDE Spark executors
  * ([[ShardedFeatureStore.upsertBatch]]): the micro-batch is reduced to
  * its newest row per key, hash-partitioned so each shard's rows land in
  * exactly one task, and appended by that task — the driver never
  * collects a batch, and a 1000-executor job writes 1000-way parallel.
  * On a cluster `root` is shared storage (or each serving node mounts
  * its own shards); in local mode it is a temp dir.
  *
  * The serving side ([[ShardedFeatureStore]]) holds per shard only an
  * OFFSET INDEX — key -> (tsMs, file offset, record length), ~40 bytes +
  * key per entry — and reads the feature payload from disk on lookup.
  * That is the memory bound that moved off the driver: the driver map
  * held every key's full feature row in one JVM; here a serving node
  * holds `O(keys_in_its_shards)` index entries and zero payloads, and
  * shards split the key space, so millions of keys x wide feature rows
  * no longer have to fit one heap.
  *
  * Readers discover writes by TAILING the log via [[ShardLogReader]];
  * writer and reader share nothing but the log file, so the two sides
  * can be different JVMs / machines (pinned by CrossJvmServingSpec,
  * which forks a real reader process). Last-write-wins by event time,
  * ties to the later log position — matching [[FeatureStore.upsert]]
  * merge semantics.
  *
  * Trade made knowingly: each lookup opens a fresh file handle for the
  * payload read (the page cache makes this a sub-µs open at measured
  * qps; a per-shard cached channel would need reopen-on-compaction
  * plumbing for a win that does not show at 16-25k qps).
  */
final class ShardedFeatureStore(val root: String, val numShards: Int)
    extends FeatureLookup {

  import ShardedFeatureStore._

  // start = offset of the record's length prefix; recLen = payload-record
  // length (key header + ts + json). The payload read re-decodes the
  // record's own key+ts and verifies them against this entry — see get()
  private final case class Loc(tsMs: Long, start: Long, recLen: Int)

  // per-shard offset index; the log-tail state lives in the reader
  private val index: Array[ConcurrentHashMap[String, Loc]] =
    Array.fill(numShards)(new ConcurrentHashMap[String, Loc]())
  private val reader = new ShardLogReader(root, numShards, "data.log")

  // ADVICE r11: attempt exhaustion degrades to a serving miss by
  // contract (a 500 mid-serving is worse than one stale-looking miss),
  // but a DETERMINISTIC failure — corrupt log, decode bug — would then
  // be an unbounded silent-miss stream distinguishable from "key
  // absent" only by scraping stderr. Consecutive exhaustions per shard
  // feed a pollable alarm; any successful payload read resets the
  // shard's streak (a compaction-race exhaustion is one-off by nature,
  // a deterministic one repeats). Bench surfaces the global count in
  // the record's counters when nonzero.
  private val consecExhaust =
    new java.util.concurrent.atomic.AtomicLongArray(numShards)

  /** Shards currently failing reads deterministically: >= 3 consecutive
    * 4-attempt exhaustions with no successful read between. */
  def alarmedShards: Seq[Int] =
    (0 until numShards).filter(consecExhaust.get(_) >= 3)

  /** Tail any new log records into the offset index. Record codec:
    * [int keyLen][key][long ts][json payload]; the held Loc points at
    * the payload bytes within the file. */
  private def refresh(shard: Int): Unit =
    reader.refresh(shard)(() => index(shard).clear()) { recs =>
      recs.foreach { case (startPos, rec) =>
        val buf = ByteBuffer.wrap(rec)
        val keyLen = buf.getInt
        // bounds BEFORE allocating: a mid-record parse in the stamp-slip
        // window can yield a garbage keyLen, and new Array[Byte](1<<30)
        // is an OutOfMemoryError that escapes the Exception-only
        // reset-and-retry fence. A framing failure must be an exception
        // the fence catches.
        if (keyLen < 0 || keyLen > rec.length - 12)
          throw new java.io.IOException(s"bad key framing: $keyLen of ${rec.length}")
        val keyBytes = new Array[Byte](keyLen)
        buf.get(keyBytes)
        val key = new String(keyBytes, StandardCharsets.UTF_8)
        val tsMs = buf.getLong
        val loc = Loc(tsMs, startPos, rec.length)
        // later log position wins ties — batch emission order,
        // exactly FeatureStore.upsert's merge
        index(shard).merge(key, loc,
          (old, nw) => if (nw.tsMs >= old.tsMs) nw else old)
      }
    }

  /** Route to the key's shard, tail any new log records, read the
    * payload from disk. One shard touched per lookup.
    *
    * Compaction race fence: a writer-side compaction can atomically
    * replace the log between this reader's refresh and its payload read
    * (different JVMs share nothing but the file), leaving the held
    * offset pointing into the rewritten bytes. Framing failure alone is
    * NOT a sufficient detector — with homogeneous record sizes a stale
    * offset lands on a perfectly valid record of the NEW generation
    * (CrossJvmServingSpec caught exactly this: ~1e-4 of lookups served
    * a wrong (ts, value) pairing under continuous compaction). So every
    * payload read re-decodes the record's OWN key and ts from the bytes
    * it actually read and verifies them against the index entry; any
    * mismatch (or framing/JSON failure) counts as a detected race, the
    * shard resets and re-parses the rewritten log, and the read
    * retries — each retry races an independent rewrite, so the attempt
    * budget of 4 bounds the probability of surfacing an error at
    * (rate of rewrites-per-read-window)^4. This verification also makes
    * a length-equal rewrite landing in the move→gen-bump window (which
    * the stat-level gen probe cannot see) harmless: the read detects it
    * record-level instead of fence-level.
    */
  override def get(key: String): Option[FeatureStore.Entry] = {
    val shard = shardOf(key, numShards)
    refresh(shard)
    def read(): Option[FeatureStore.Entry] =
      Option(index(shard).get(key)).map { loc =>
        val raf = new RandomAccessFile(reader.logFile(shard), "r")
        try {
          raf.seek(loc.start)
          val recLen = raf.readInt()
          if (recLen != loc.recLen)
            throw new java.io.IOException("stale offset: record length moved")
          val rec = new Array[Byte](recLen)
          raf.readFully(rec)
          val buf = ByteBuffer.wrap(rec)
          val keyLen = buf.getInt
          if (keyLen < 0 || keyLen > recLen - 12)
            throw new java.io.IOException("stale offset: key framing")
          val keyBytes = new Array[Byte](keyLen)
          buf.get(keyBytes)
          val ts = buf.getLong
          if (ts != loc.tsMs || new String(keyBytes, StandardCharsets.UTF_8) != key)
            throw new java.io.IOException("stale offset: record moved under read")
          FeatureStore.Entry(loc.tsMs,
            parsePayload(java.util.Arrays.copyOfRange(rec, 4 + keyLen + 8, recLen)))
        } finally raf.close()
      }
    var attempts = 4
    var result: Option[FeatureStore.Entry] = None
    var done = false
    while (!done) {
      attempts -= 1
      try { result = read(); done = true; consecExhaust.set(shard, 0L) }
      catch {
        case _: InterruptedException =>
          // an interrupt is a shutdown signal, not a compaction race —
          // degrade to a miss but keep the thread's interrupt status
          Thread.currentThread().interrupt()
          done = true
        case _: Exception if attempts > 0 =>
          reader.reset(shard)(() => index(shard).clear())
          refresh(shard)
        case e: Exception =>
          // Attempt exhaustion = 4 consecutive independent compaction
          // races (probability (rewrites-per-read-window)^4). Degrade to
          // a miss rather than throwing out of the FeatureLookup
          // contract — a 500 from RequestServer mid-serving is strictly
          // worse than one stale-looking miss the client will retry
          // (ADVICE r10). Reset so the next lookup re-parses cleanly —
          // but say so on stderr: a DETERMINISTIC failure (corrupt log,
          // decode bug) would otherwise be indistinguishable from the
          // key not existing, on every lookup, forever.
          System.err.println(s"[sharded-store] shard $shard: 4 read attempts " +
            s"failed (${e.getClass.getSimpleName}: ${e.getMessage}) — serving miss")
          val streak = consecExhaust.incrementAndGet(shard)
          ShardedFeatureStore.exhaustedReads.increment()
          if (streak == 3L)
            System.err.println(s"[sharded-store] ALARM shard $shard: " +
              "3 consecutive exhaustions — failure looks deterministic, " +
              "not a compaction race (alarmedShards now reports it)")
          reader.reset(shard)(() => index(shard).clear())
          done = true
      }
    }
    result
  }

  override def size: Int = {
    (0 until numShards).foreach(refresh)
    index.map(_.size).sum
  }

  override def keys: Seq[String] = {
    import scala.jdk.CollectionConverters._
    (0 until numShards).foreach(refresh)
    index.toSeq.flatMap(_.keySet.asScala)
  }
}

object ShardedFeatureStore {

  /** Process-wide count of 4-attempt read exhaustions across every
    * store instance — the monitorable "silent miss" metric (ADVICE
    * r11). The bench writes it into the record's counters when
    * nonzero; per-shard streak alarms live on the instance
    * ([[ShardedFeatureStore.alarmedShards]]). */
  val exhaustedReads = new java.util.concurrent.atomic.LongAdder()

  /** The key -> shard route — one stable hash on both the Spark write
    * path and the serving lookup path (the reference's RequestRoute,
    * src/runtime/partition.rs:131-152). md5-prefix keeps it portable
    * across JVMs and engines (same contract as the dedup family's
    * hash31). The digest instance is thread-local: this runs once per
    * serving lookup at tens-of-thousands qps, and
    * MessageDigest.getInstance is a provider lookup + allocation.
    */
  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  def shardOf(key: String, numShards: Int): Int = {
    val m = md5.get()
    m.reset()
    val d = m.digest(key.getBytes(StandardCharsets.UTF_8))
    val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    (h % numShards).toInt
  }

  /** `foreachBatch` upsert sink, executor-side: reduce the batch to its
    * newest row per key (same `__seq` tie-break contract as
    * [[FeatureStore.upsertBatch]]), hash-partition so each shard is
    * written by exactly ONE task, and append to that shard's log. Driver
    * transfer: zero rows.
    */
  def upsertBatch(root: String, numShards: Int, keyCol: String, tsCol: String,
                  compactBytes: Long = 64L << 20)
                 (batch: DataFrame, batchId: Long): Unit = {
    if (!batch.isEmpty) {
      val hasSeq = batch.schema.fieldNames.contains("__seq")
      val ord =
        if (hasSeq) Seq(col(tsCol).desc, col("__seq").desc)
        else Seq(col(tsCol).desc)
      val w = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
      val latest = batch.withColumn("__rn", row_number().over(w))
        .where(col("__rn") === 1).drop("__rn")
      val names = latest.schema.fieldNames.filter(n => n != "__seq")
      val nShards = numShards
      val rootPath = root
      val tCol = tsCol
      // the key stringifies ONCE, in Spark, and both the shard routing
      // expression and the writer consume that same string — a raw-key
      // expression here plus String.valueOf in the task could format an
      // exotic key type differently and break single-writer-per-shard.
      // NULL keys coalesce to the literal "null" (String.valueOf's
      // rendering) BEFORE the md5: a null __key_str would make the shard
      // expression NULL and route the row to a partition another task
      // owns while the writer still appends it to shardOf("null")'s log —
      // two concurrent writers on one log
      latest
        .withColumn("__key_str",
          coalesce(col(keyCol).cast("string"), lit("null")))
        .withColumn("__shard",
          expr(s"CAST(conv(substring(md5(__key_str), 1, 8), 16, 10) " +
            s"AS BIGINT) % $numShards"))
        .repartition(numShards, col("__shard"))
        .foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
          writePartition(rows, rootPath, nShards, keyCol, tCol, names, compactBytes)
        }
    }
  }

  /** One task's append pass: group its rows by shard (hash partitioning
    * put each shard's rows in one task, but one task can own several
    * shard ids), serialize, append each shard's records with a single
    * channel write.
    */
  private def writePartition(rows: Iterator[org.apache.spark.sql.Row],
                             root: String, numShards: Int,
                             keyCol: String, tsCol: String,
                             names: Array[String], compactBytes: Long): Unit = {
    val mapper = new ObjectMapper()
    val byShard = scala.collection.mutable.Map[Int, java.io.ByteArrayOutputStream]()
    rows.foreach { r =>
      val key = String.valueOf(r.getAs[Any]("__key_str"))
      val ts = r.getAs[Number](tsCol).longValue()
      val node = mapper.createObjectNode()
      names.iterator.filter(_ != keyCol).foreach { n =>
        putAny(node, n, r.getAs[Any](n))
      }
      val payload = mapper.writeValueAsBytes(node)
      val keyBytes = key.getBytes(StandardCharsets.UTF_8)
      val rec = ByteBuffer.allocate(4 + keyBytes.length + 8 + payload.length)
        .putInt(keyBytes.length).put(keyBytes).putLong(ts).put(payload)
        .array()
      byShard.getOrElseUpdate(shardOf(key, numShards),
        new java.io.ByteArrayOutputStream()).write(ShardLog.frame(rec))
    }
    byShard.foreach { case (shard, bytes) =>
      val size = ShardLog.append(root, shard, "data.log", bytes.toByteArray)
      // bitcask merge, run by the task that owns this shard in this
      // batch — the single-writer-per-shard invariant already holds, so
      // no writer can append concurrently with the rewrite
      if (size > compactBytes) compactShard(root, shard)
    }
  }

  /** Rewrite one shard's log keeping only the newest record per key —
    * the append-only log otherwise grows with UPDATE volume, not key
    * count. The move/gen-bump ordering and reader fencing live in
    * [[ShardLog.compact]]; this supplies only the merge policy. Must
    * only run while no writer can append (the owning upsert task,
    * between appends).
    */
  private[serving] def compactShard(root: String, shard: Int): Unit =
    ShardLog.compact(root, shard, "data.log") { bytes =>
      // newest per key, later log position winning ts ties
      val latest = scala.collection.mutable.LinkedHashMap[String, (Long, Array[Byte])]()
      ShardLog.eachRecord(bytes) { (_, rec) =>
        val buf = ByteBuffer.wrap(rec)
        val keyLen = buf.getInt
        val keyBytes = new Array[Byte](keyLen)
        buf.get(keyBytes)
        val key = new String(keyBytes, StandardCharsets.UTF_8)
        val ts = buf.getLong
        latest.get(key) match {
          case Some((oldTs, _)) if oldTs > ts => ()
          case _ => latest.update(key, (ts, rec))
        }
      }
      val out = new java.io.ByteArrayOutputStream()
      latest.values.foreach { case (_, rec) => out.write(ShardLog.frame(rec)) }
      out.toByteArray
    }

  /** Compaction generation of a shard (0 when never compacted; exposed
    * for specs and ops visibility). */
  def genOf(root: String, shard: Int): Long = ShardLog.genOf(root, shard)

  private def putAny(o: ObjectNode, n: String, v: Any): Unit = v match {
    case null                 => o.putNull(n)
    case d: java.lang.Double  => o.put(n, d.doubleValue())
    case f: java.lang.Float   => o.put(n, f.doubleValue())
    case l: java.lang.Long    => o.put(n, l.longValue())
    case i: java.lang.Integer => o.put(n, i.longValue())
    case s: java.lang.Short   => o.put(n, s.longValue())
    case b: java.lang.Boolean => o.put(n, b.booleanValue())
    case bd: java.math.BigDecimal => o.put(n, bd.doubleValue())
    case s: String            => o.put(n, s)
    // arrays/structs/timestamps would silently round-trip as their
    // toString on this path while the driver-map store serves them typed
    // — refuse loudly instead of corrupting (project them to scalars or
    // JSON-encode them in the frame before the sink)
    case other => throw new IllegalArgumentException(
      s"sharded store cannot serialize non-scalar feature '$n' of type " +
        s"${other.getClass.getName}; project it to a scalar or a JSON string")
  }

  private[serving] def parsePayload(bytes: Array[Byte]): Map[String, Any] = {
    val mapper = new ObjectMapper()
    val node = mapper.readTree(bytes)
    val it = node.fields()
    val b = Map.newBuilder[String, Any]
    while (it.hasNext) {
      val e = it.next()
      val v = e.getValue
      b += e.getKey -> (
        if (v.isNull) null
        else if (v.isIntegralNumber) v.asLong()
        else if (v.isFloatingPointNumber) v.asDouble()
        else if (v.isBoolean) v.asBoolean()
        else v.asText())
    }
    b.result()
  }
}
