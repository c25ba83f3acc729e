package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{SlidingWindows, StateStoreConf, StreamingDedup}
import graft.streaming.SlidingWindows.{AggSpec, Frame, RangeMs, RowsN}
import graft.operators.{Dedup, FuzzyJoin}

/** Seed-pinned randomized differential testing of the custom engines
  * (r13 VERDICT "next round" #1): after six fully-green rounds on fixed
  * fixtures, the residual correctness risk lives in the parameter space
  * the fixed specs never visit. Each family draws N random configurations
  * from a pinned base seed and asserts engine == independent oracle:
  *
  *  A. SlidingWindows (FMGWS) AND SlidingWindowsTws vs batch SQL OVER —
  *     random agg sets over the full registry × random RANGE/ROWS frames
  *     × random tile granularities/hierarchies × random out-of-order
  *     delivery (lateness derived from the actual delivery schedule so
  *     no row is legitimately droppable; parity must then be EXACT).
  *  B. FuzzyJoin at every blocking width (1, 2, 3, auto) vs a plain-Scala
  *     brute-force Jaccard oracle — random corpora and thresholds.
  *  C. StreamingDedup, both engines, vs the batch MinHash pipeline —
  *     random (k, numHashes, bands, threshold) and random arrival order;
  *     engines must match each other EXACTLY (orientation + markers) and
  *     match batch as undirected pair sets when no bucket overflowed.
  *
  * Every failure message leads with the config's seed: re-run with
  * SPARK_GRAFT_PROP_SEED=<seed> SPARK_GRAFT_PROP_ITERS=1 to replay it.
  * The reference ships the same idea as a fixed matrix smoke
  * (volga src/runtime/operators/window/window_operator_tests.rs:1006);
  * randomization covers the cells the matrix doesn't enumerate.
  */
class PropertyParitySpec extends AnyFunSuite {

  private val baseSeed: Long =
    sys.env.get("SPARK_GRAFT_PROP_SEED").map(_.toLong).getOrElse(941L)
  private val iters: Int =
    sys.env.get("SPARK_GRAFT_PROP_ITERS").map(_.toInt).getOrElse(3)

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.maxFields", "256")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    GraftSession.prepare(s, null) // registers the window UDAFs into SQL
    s
  }


  // =====================================================================
  // Family A: sliding-window engines vs batch OVER
  // =====================================================================

  /** One registry kind: how to build its AggSpec and its batch SQL. Slot
    * layout is fixed — numeric slots (value, big), string slot (cate),
    * big is the 0/1 `_where` condition in numeric slot 1. */
  private case class K(kind: String, needsN: Boolean = false,
                       vStr: Boolean = false, where: Boolean = false,
                       cate: Boolean = false) {
    def spec(name: String, frame: Frame, n: Int): AggSpec =
      AggSpec(name, kind, frame, if (needsN) n else 0,
        vIdx = 0, cIdx = 0, vStr = vStr, wIdx = if (where) 1 else -1)
    def sql(name: String, w: String, n: Int): String = {
      val fn = if (kind == "median") "graft_median" else kind
      val args =
        if (kind == "top" || kind == "topn_frequency")
          (if (vStr) "cate" else "value") + s", $n"
        else if (kind == "distinct_count") if (vStr) "cate" else "value"
        else if (SlidingWindows.isRatioKind(kind) ||
                 (kind.startsWith("top_n_") && kind.endsWith("_cate_where")))
          s"value, big = 1.0, cate, $n"
        else if (kind.endsWith("_cate_where")) "value, big = 1.0, cate"
        else if (kind.endsWith("_cate")) "value, cate"
        else if (kind.endsWith("_where")) "value, big = 1.0"
        else "value"
      s"$fn($args) OVER $w AS $name"
    }
  }

  private val kindPool: Seq[K] = Seq(
    K("sum"), K("count"), K("avg"), K("min"), K("max"),
    K("stddev_samp"), K("stddev_pop"), K("var_pop"), K("var_samp"),
    K("variance"),
    K("top", needsN = true), K("topn_frequency", needsN = true),
    K("topn_frequency", needsN = true, vStr = true),
    K("top1_ratio"),
    K("distinct_count"), K("distinct_count", vStr = true), K("median"),
    K("sum_where", where = true), K("avg_where", where = true),
    K("count_where", where = true), K("min_where", where = true),
    K("max_where", where = true),
    K("sum_cate", cate = true), K("count_cate", cate = true),
    K("avg_cate", cate = true), K("min_cate", cate = true),
    K("max_cate", cate = true),
    K("sum_cate_where", where = true, cate = true),
    K("avg_cate_where", where = true, cate = true),
    K("count_cate_where", where = true, cate = true),
    K("min_cate_where", where = true, cate = true),
    K("max_cate_where", where = true, cate = true),
    K("top_n_key_sum_cate_where", needsN = true, where = true, cate = true),
    K("top_n_key_count_cate_where", needsN = true, where = true, cate = true),
    K("top_n_value_count_cate_where", needsN = true, where = true, cate = true),
    K("top_n_value_min_cate_where", needsN = true, where = true, cate = true),
    K("top_n_value_max_cate_where", needsN = true, where = true, cate = true),
    K("top_n_value_avg_cate_where", needsN = true, where = true, cate = true),
    K("top_n_key_ratio_cate", needsN = true, where = true, cate = true),
    K("top_n_value_ratio_cate", needsN = true, where = true, cate = true))

  private def normRow(r: Row): Seq[Any] =
    (0 until r.length).map { i =>
      r.get(i) match {
        case null                 => null
        case d: java.lang.Double  => d.doubleValue()
        case l: java.lang.Long    => l.toDouble
        case n: java.lang.Integer => n.toDouble
        case other                => other
      }
    }

  /** Tolerance-aware row comparison: fixed 1e-6 rounding flakes when a
    * variance-family float lands on the rounding boundary (batch OVER
    * and the tiled engine associate additions differently — an ulp-level
    * difference rounds to ADJACENT millionths; found by this harness at
    * seed 555123). Rows are keyed (ts, key) — unique by construction. */
  private def assertRowsEqual(cfg: String, engine: String,
                              got: Set[Seq[Any]], want: Set[Seq[Any]]): Unit = {
    def approx(a: Any, b: Any): Boolean = (a, b) match {
      case (null, null) => true
      case (x: Double, y: Double) =>
        (x.isNaN && y.isNaN) ||
          math.abs(x - y) <= 1e-6 * math.max(1.0, math.max(math.abs(x), math.abs(y)))
      case (x, y) => x == y
    }
    assert(got.size == want.size,
      s"[$cfg] $engine row count ${got.size} != batch ${want.size}")
    def keyed(s: Set[Seq[Any]]) = s.map(r => (r(0), r(1)) -> r).toMap
    val gm = keyed(got); val wm = keyed(want)
    assert(gm.keySet == wm.keySet,
      s"[$cfg] $engine keys diverged: missing=${(wm.keySet -- gm.keySet).take(3)} " +
        s"extra=${(gm.keySet -- wm.keySet).take(3)}")
    wm.foreach { case (k, w) =>
      val g = gm(k)
      val bad = w.indices.filterNot(i => approx(g(i), w(i)))
      assert(bad.isEmpty,
        s"[$cfg] $engine diverged at $k cols=$bad: got=${bad.map(g)} want=${bad.map(w)}")
    }
  }

  /** Random events: globally unique, strictly increasing ts (ROWS frames
    * are order-ambiguous under ts ties — a deliberate exclusion), random
    * key/value/cate, random independent 0/1 `big` condition. */
  private def genEvents(rnd: scala.util.Random)
      : Seq[(Long, String, Double, Double, String)] = {
    val n = 240 + rnd.nextInt(180)
    val numKeys = 2 + rnd.nextInt(3)
    val cates = Seq("A", "B", "C", "D").take(2 + rnd.nextInt(3))
    var ts = 1704067200000L
    (0 until n).map { _ =>
      ts += 100 + rnd.nextInt(1400)
      (ts, s"k${rnd.nextInt(numKeys)}", rnd.nextInt(40) / 4.0,
        if (rnd.nextBoolean()) 1.0 else 0.0,
        cates(rnd.nextInt(cates.length)))
    }
  }

  /** Split into random-size micro-batches, shuffled either locally
    * (bounded disorder) or globally (worst case), and compute the minimal
    * lateness that guarantees the engine may not drop ANY row: for a row
    * in batch i the watermark is max-ts(batches < i) − lateness, so
    * lateness must exceed every row's regression below that running max. */
  private def planDelivery(rnd: scala.util.Random,
                           evs: Seq[(Long, String, Double, Double, String)])
      : (Seq[Seq[(Long, String, Double, Double, String)]], Long) = {
    val size = 60 + rnd.nextInt(100)
    val batches =
      if (rnd.nextBoolean())
        evs.sortBy(_._1).grouped(size).toSeq.map(b => rnd.shuffle(b))
      else rnd.shuffle(evs).grouped(size).toSeq
    var maxPrev = Long.MinValue
    var lateness = 0L
    batches.foreach { b =>
      if (maxPrev != Long.MinValue)
        b.foreach(r => lateness = math.max(lateness, maxPrev - r._1 + 1))
      maxPrev = math.max(maxPrev, b.map(_._1).max)
    }
    (batches, lateness)
  }

  private def runWindowEngine(tws: Boolean,
                              batches: Seq[Seq[(Long, String, Double, Double, String)]],
                              specs: Seq[AggSpec], lateness: Long,
                              gran: Long, coarse: Seq[Long]): Set[Seq[Any]] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    StateStoreConf.withSaved(spark) {
      val mem = MemoryStream[(Long, String, Double, Double, String)]
      val df = mem.toDF().toDF("ts_ms", "key", "value", "big", "cate")
      val out =
        if (tws) graft.streaming.SlidingWindowsTws.streamingMulti(df, "key", "ts_ms",
          Seq("value", "big"), Seq("cate"), specs, lateness, gran, coarse)
        else SlidingWindows.streamingMulti(df, "key", "ts_ms",
          Seq("value", "big"), Seq("cate"), specs, lateness, gran, coarse)
      val qname = s"prop_win_${System.nanoTime()}"
      val q = out.writeStream.outputMode("append").format("memory")
        .queryName(qname).trigger(Trigger.ProcessingTime(0)).start()
      try {
        batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
        val keys = batches.flatten.map(_._2).distinct
        mem.addData(keys.map(k =>
          (SlidingWindows.FLUSH_TS, k, 0.0, 0.0, null: String)): _*)
        q.processAllAvailable()
        mem.addData((SlidingWindows.FLUSH_TS, keys.head, 0.0, 0.0, null: String))
        q.processAllAvailable()
        spark.table(qname).collect().map(normRow).toSet
      } finally q.stop()
    }
  }

  test("A: random window configs — FMGWS and TWS == batch OVER") {
    import spark.implicits._
    (0 until iters).foreach { i =>
      val seed = baseSeed + i
      val rnd = new scala.util.Random(seed)
      val evs = genEvents(rnd)
      val (batches, lateness) = planDelivery(rnd, evs)

      val nSpecs = 4 + rnd.nextInt(3)
      val picks = rnd.shuffle(kindPool).take(nSpecs)
      val specs = picks.zipWithIndex.map { case (k, j) =>
        val frame: Frame =
          if (rnd.nextBoolean()) RangeMs(3000L + rnd.nextInt(27) * 1000L)
          else RowsN(2 + rnd.nextInt(7))
        k.spec(s"a$j", frame, 2 + rnd.nextInt(2))
      }
      val kSpecs = picks.zip(specs)
      val gran = Seq(1000L, 2000L, 5000L, 10000L)(rnd.nextInt(4))
      val coarse = if (rnd.nextBoolean()) Seq(gran * 5, gran * 30) else Nil
      val cfg = s"seed=$seed specs=${specs.map(s => s"${s.kind}/${s.frame}").mkString(",")} " +
        s"lateness=$lateness gran=$gran coarse=$coarse batches=${batches.size}"
      info(s"[prop-A] $cfg")

      // batch OVER reference (one WINDOW clause per distinct frame)
      evs.toDF("ts_ms", "key", "value", "big", "cate")
        .createOrReplaceTempView("prop_evt")
      def wName(f: Frame): String = f match {
        case RangeMs(l) => s"wr$l"
        case RowsN(n)   => s"wn$n"
      }
      val windows = specs.map(_.frame).distinct.map {
        case f @ RangeMs(l) => s"${wName(f)} AS (PARTITION BY key ORDER BY ts_ms " +
          s"RANGE BETWEEN $l PRECEDING AND CURRENT ROW)"
        case f @ RowsN(n) => s"${wName(f)} AS (PARTITION BY key ORDER BY ts_ms " +
          s"ROWS BETWEEN $n PRECEDING AND CURRENT ROW)"
      }
      val exprs = kSpecs.map { case (k, s) =>
        k.sql(s.name, wName(s.frame), if (k.needsN) s.n else 0)
      }
      val sql = s"SELECT ts_ms, key, value, big, cate, ${exprs.mkString(", ")} " +
        s"FROM prop_evt WINDOW ${windows.mkString(", ")}"
      val want = spark.sql(sql).collect().map(normRow).toSet

      Seq(false, true).foreach { tws =>
        val got = runWindowEngine(tws, batches, specs, lateness, gran, coarse)
        assertRowsEqual(cfg, if (tws) "TWS" else "FMGWS", got, want)
      }
    }
  }

  // =====================================================================
  // Family B: FuzzyJoin all widths vs brute force
  // =====================================================================

  /** Independent brute-force oracle (same construction as FuzzyJoinSpec:
    * String.sliding(3) + explicit packing — shares no code with
    * FuzzyJoin.grams3). */
  private def bruteJaccard(ls: Seq[(Long, String)], rs: Seq[(Long, String)],
                           num: Int, den: Int): Set[(Long, Long)] = {
    def grams(s: String): Set[Long] =
      if (s.length < 3) Set.empty
      else s.sliding(3).map { g =>
        (g.charAt(0).toLong << 42) | (g.charAt(1).toLong << 21) | g.charAt(2).toLong
      }.toSet
    val lg = ls.map { case (i, s) => (i, grams(s)) }
    val rg = rs.map { case (i, s) => (i, grams(s)) }
    (for {
      (li, a) <- lg; (ri, b) <- rg
      if a.nonEmpty && b.nonEmpty
      inter = (a & b).size.toLong
      uni = a.size + b.size - inter
      if inter * den >= uni * num
    } yield (li, ri)).toSet
  }

  /** Random corpus with deliberate near-dup structure: token sequences
    * from a small vocabulary, plus mutated copies (char edit / token
    * drop / exact dup) so every threshold has true matches. */
  private def genCorpus(rnd: scala.util.Random, n: Int, idBase: Long)
      : Seq[(Long, String)] = {
    val vocab = Seq("alpha", "bravo", "carbon", "delta", "epsilon", "fox",
      "gamma", "hotel", "indigo", "jungle", "kilo", "lima")
    val bases = (0 until n).map { i =>
      (0 until 2 + rnd.nextInt(4))
        .map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
    }
    bases.zipWithIndex.map { case (s, i) =>
      val mutated = rnd.nextInt(4) match {
        case 0 => s // verbatim
        case 1 => if (s.length > 4) s.updated(rnd.nextInt(s.length), 'q') else s
        case 2 => s.split(" ").drop(1).mkString(" ") // token drop
        case 3 => s + " " + vocab(rnd.nextInt(vocab.length))
      }
      (idBase + i, if (rnd.nextBoolean()) s else mutated)
    }
  }

  test("B: random fuzzy-join configs — every width and auto == brute force") {
    import spark.implicits._
    val thresholds = Seq((1, 3), (1, 2), (7, 25), (2, 3), (4, 5))
    (0 until iters).foreach { i =>
      val seed = baseSeed + 100 + i
      val rnd = new scala.util.Random(seed)
      val ls = genCorpus(rnd, 40 + rnd.nextInt(60), 1000L)
      val rs = genCorpus(rnd, 40 + rnd.nextInt(60), 5000L)
      val (num, den) = thresholds(rnd.nextInt(thresholds.length))
      val cfg = s"seed=$seed nl=${ls.size} nr=${rs.size} threshold=$num/$den"
      info(s"[prop-B] $cfg")
      val expect = bruteJaccard(ls, rs, num, den)
      val l = ls.toDF("lid", "lname")
      val r = rs.toDF("rid", "rname")
      Seq(0, 1, 2, 3).foreach { w =>
        val got = FuzzyJoin.jaccardJoin(l, "lid", "lname", r, "rid", "rname",
            num = num, den = den, blockWidth = w)
          .select("lid", "rid").collect()
          .map(x => (x.getLong(0), x.getLong(1))).toSet
        assert(got == expect,
          s"[$cfg] width=$w diverged: missing=${(expect -- got).take(3)} " +
            s"extra=${(got -- expect).take(3)}")
      }
    }
  }

  // =====================================================================
  // Family C: StreamingDedup both engines vs batch MinHash
  // =====================================================================

  private def runDedupEngine(tws: Boolean,
                             batches: Seq[Seq[(Long, String)]],
                             k: Int, numHashes: Int, bands: Int,
                             threshold: Double, maxBucket: Int)
      : Set[(Long, Long)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    StateStoreConf.withSaved(spark) {
      val mem = MemoryStream[(Long, String)]
      val df = mem.toDF().toDF("doc_id", "text")
      val out =
        if (tws) StreamingDedup.minhashStreamingPairsTws(df, "doc_id", "text",
          k, numHashes, bands, threshold, maxBucket)
        else StreamingDedup.minhashStreamingPairs(df, "doc_id", "text",
          k, numHashes, bands, threshold, maxBucket)
      val qname = s"prop_dedup_${System.nanoTime()}"
      val q = out.writeStream.outputMode("append").format("memory")
        .queryName(qname).trigger(Trigger.ProcessingTime(0)).start()
      try {
        batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
        spark.table(qname).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      } finally q.stop()
    }
  }

  /** Docs with shared shingle structure: near-dups are copies of a base
    * doc with 0-2 word substitutions. */
  private def genDocs(rnd: scala.util.Random): Seq[(Long, String)] = {
    val vocab = (0 until 40).map(i => s"w$i")
    val nBase = 30 + rnd.nextInt(30)
    val bases = (0 until nBase).map { _ =>
      (0 until 10 + rnd.nextInt(10)).map(_ => vocab(rnd.nextInt(vocab.length)))
    }
    val docs = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
    bases.foreach { b =>
      docs += b
      // 0-2 near-dup copies with small perturbations
      (0 until rnd.nextInt(3)).foreach { _ =>
        val c = b.toArray
        (0 until rnd.nextInt(2)).foreach { _ =>
          c(rnd.nextInt(c.length)) = vocab(rnd.nextInt(vocab.length))
        }
        docs += c.toSeq
      }
    }
    rnd.shuffle(docs.toSeq).zipWithIndex.map { case (words, i) =>
      ((i + 1).toLong, words.mkString(" "))
    }
  }

  test("C: random dedup configs — FMGWS == TWS exactly; both == batch (undirected)") {
    import spark.implicits._
    val combos = Seq((16, 4), (32, 8), (32, 4), (64, 8), (64, 16))
    (0 until iters).foreach { i =>
      val seed = baseSeed + 200 + i
      val rnd = new scala.util.Random(seed)
      val docs = genDocs(rnd)
      val (numHashes, bands) = combos(rnd.nextInt(combos.length))
      val k = 3 + rnd.nextInt(3)
      val threshold = Seq(0.6, 0.7, 0.8, 0.9)(rnd.nextInt(4))
      // cap never engages on parity runs (cap semantics get their own
      // engine-equality stress below)
      val maxBucket = docs.size + 10
      val batches = rnd.shuffle(docs).grouped(20 + rnd.nextInt(40)).toSeq
      val cfg = s"seed=$seed docs=${docs.size} k=$k hashes=$numHashes " +
        s"bands=$bands t=$threshold batches=${batches.size}"
      info(s"[prop-C] $cfg")

      val fm = runDedupEngine(tws = false, batches, k, numHashes, bands,
        threshold, maxBucket)
      val tw = runDedupEngine(tws = true, batches, k, numHashes, bands,
        threshold, maxBucket)
      assert(fm == tw,
        s"[$cfg] FMGWS != TWS: fmOnly=${(fm -- tw).take(3)} twOnly=${(tw -- fm).take(3)}")

      assert(!fm.exists(_._1 == StreamingDedup.OverflowMarker),
        s"[$cfg] unexpected overflow at cap=$maxBucket")
      val batch = Dedup.minhashAccepted(docs.toDF("doc_id", "text"),
          "doc_id", "text", k, numHashes, bands, threshold, maxBucket)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      def undirected(s: Set[(Long, Long)]): Set[(Long, Long)] =
        s.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      assert(undirected(fm) == undirected(batch),
        s"[$cfg] stream != batch: streamOnly=${(undirected(fm) -- undirected(batch)).take(3)} " +
          s"batchOnly=${(undirected(batch) -- undirected(fm)).take(3)}")
    }
  }

  test("C2: cap stress — engines agree on overflow markers and capped pairs") {
    import spark.implicits._
    (0 until iters).foreach { i =>
      val seed = baseSeed + 300 + i
      val rnd = new scala.util.Random(seed)
      // many exact copies of few bases => buckets overflow a tiny cap
      val base = (0 until 12).map(_ => s"t${rnd.nextInt(8)}").mkString(" ")
      val docs = rnd.shuffle((1 to 30).map(id =>
        (id.toLong, if (rnd.nextBoolean()) base else base + s" x${rnd.nextInt(3)}")))
      val maxBucket = 2 + rnd.nextInt(3)
      val batches = docs.grouped(5 + rnd.nextInt(10)).toSeq
      val cfg = s"seed=$seed cap=$maxBucket batches=${batches.size}"
      info(s"[prop-C2] $cfg")
      val fm = runDedupEngine(tws = false, batches, 3, 16, 4, 0.8, maxBucket)
      val tw = runDedupEngine(tws = true, batches, 3, 16, 4, 0.8, maxBucket)
      assert(fm == tw,
        s"[$cfg] FMGWS != TWS under cap: fmOnly=${(fm -- tw).take(3)} " +
          s"twOnly=${(tw -- fm).take(3)}")
      assert(fm.exists(_._1 == StreamingDedup.OverflowMarker),
        s"[$cfg] cap stress never overflowed — raise duplication")
    }
  }
}
