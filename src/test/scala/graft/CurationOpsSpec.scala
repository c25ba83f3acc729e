package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Invariant pins for the r7 curation entries (decontamination, chunking,
  * repetition filter, winnowing) on the real sf0.001 documents — the
  * driver's DuckDB oracle pins exact values; these pin the semantic
  * invariants a refactor could silently break while still matching a
  * co-refactored oracle.
  */
class CurationOpsSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def haveData = new java.io.File(dir).isDirectory

  test("q_chunk covers every token exactly: stride tiling reconstructs doc lengths") {
    assume(haveData)
    val chunks = SparkEntry.queries("q_chunk")(spark, dir)
    chunks.createOrReplaceTempView("chk")
    // exact per-chunk law: a chunk at idx i holds least(64, n_tok - 48*i)
    // tokens (the trailing <=2 chunks are short because stride 48 < width
    // 64); chunk_idx is dense 0..(n_tok-1) DIV 48
    val bad = spark.sql("""
      WITH docs AS (SELECT doc_id, size(split(text, ' ')) AS n_tok
                    FROM parquet.`/root/testdata/sf0.001/documents.parquet`),
      per_chunk AS (
        SELECT c.doc_id, c.chunk_idx, c.n_tokens, d.n_tok
        FROM chk c JOIN docs d ON c.doc_id = d.doc_id),
      per_doc AS (
        SELECT doc_id, count(*) AS n_chunks, min(chunk_idx) AS min_idx,
               max(chunk_idx) AS max_idx, max(n_tok) AS n_tok
        FROM per_chunk GROUP BY doc_id)
      SELECT doc_id FROM per_chunk
      WHERE n_tokens <> least(64, n_tok - 48 * chunk_idx)
      UNION ALL
      SELECT doc_id FROM per_doc
      WHERE min_idx <> 0 OR max_idx <> n_chunks - 1
         OR max_idx <> (n_tok - 1) DIV 48
    """).count()
    assert(bad == 0L)
  }

  test("q_repetition ratios are consistent and bounded") {
    assume(haveData)
    val rep = SparkEntry.queries("q_repetition")(spark, dir)
    rep.createOrReplaceTempView("rep")
    val bad = spark.sql("""
      SELECT doc_id FROM rep
      WHERE n_distinct > n_tokens OR n_distinct <= 0
         OR dup_ratio < 0.0 OR dup_ratio >= 1.0
         OR abs(dup_ratio - CAST(n_tokens - n_distinct AS DOUBLE) / n_tokens) > 0
    """).count()
    assert(bad == 0L)
    assert(rep.count() == GraftSession.table(spark, dir, "documents").count())
  }

  test("q_winnow fingerprints are a subset of the doc's 5-gram hashes, <= gram count") {
    assume(haveData)
    val fps = SparkEntry.queries("q_winnow")(spark, dir)
    fps.createOrReplaceTempView("fps")
    GraftSession.prepare(spark, dir)
    // every selected fingerprint must be an actual 5-gram hash of the doc
    val orphan = spark.sql("""
      WITH toks AS (SELECT doc_id, split(text, ' ') AS t FROM documents),
      g AS (SELECT doc_id,
                   CAST(conv(substring(md5(concat_ws(' ', slice(t, CAST(i AS INT), 5))), 1, 15), 16, 10) AS BIGINT) AS h
            FROM (SELECT doc_id, t, explode(sequence(1, size(t) - 4)) AS i
                  FROM toks WHERE size(t) >= 5))
      SELECT f.doc_id FROM fps f LEFT ANTI JOIN g ON f.doc_id = g.doc_id AND f.fp = g.h
    """).count()
    assert(orphan == 0L)
    // winnowing compresses: fingerprints per doc < grams per doc (w=4)
    val over = spark.sql("""
      WITH nf AS (SELECT doc_id, count(*) AS n FROM fps GROUP BY doc_id),
      ng AS (SELECT doc_id, size(split(text, ' ')) - 4 AS n FROM documents
             WHERE size(split(text, ' ')) >= 5)
      SELECT nf.doc_id FROM nf JOIN ng ON nf.doc_id = ng.doc_id WHERE nf.n > ng.n
    """).count()
    assert(over == 0L)
  }

  test("q_pack is a greedy first-fit: bins dense, capacity respected, every doc placed once") {
    assume(haveData)
    val p = SparkEntry.queries("q_pack")(spark, dir)
    p.createOrReplaceTempView("pk")
    GraftSession.prepare(spark, dir)
    val bad = spark.sql("""
      WITH d AS (SELECT source, doc_id, size(split(text, ' ')) AS n FROM documents),
      j AS (SELECT pk.source, pk.doc_id, pk.bin, d.n
            FROM pk JOIN d ON pk.source = d.source AND pk.doc_id = d.doc_id),
      bins AS (SELECT source, bin, sum(n) AS used, count(*) AS n_docs
               FROM j GROUP BY source, bin)
      -- a bin over capacity must be a single oversized doc; bin ids dense 0..max
      SELECT source FROM bins WHERE used > 256 AND n_docs > 1
      UNION ALL
      SELECT source FROM bins GROUP BY source
      HAVING min(bin) <> 0 OR max(bin) <> count(*) - 1
    """).count()
    assert(bad == 0L)
    // every doc placed exactly once
    assert(p.count() == GraftSession.table(spark, dir, "documents").count())
    assert(p.select("doc_id").distinct().count() == p.count())
    // greedy tightness: consecutive bins can't be merged — bin b's load plus
    // bin b+1's FIRST doc must exceed capacity (else greedy would have
    // continued filling b)
    val loose = spark.sql("""
      WITH d AS (SELECT source, doc_id, size(split(text, ' ')) AS n FROM documents),
      j AS (SELECT pk.source, pk.doc_id, pk.bin, d.n
            FROM pk JOIN d ON pk.source = d.source AND pk.doc_id = d.doc_id),
      bins AS (SELECT source, bin, sum(n) AS used FROM j GROUP BY source, bin),
      firsts AS (SELECT source, bin, min(doc_id) AS first_doc FROM j GROUP BY source, bin),
      fn AS (SELECT f.source, f.bin, j.n AS first_n FROM firsts f
             JOIN j ON j.source = f.source AND j.doc_id = f.first_doc)
      SELECT b.source FROM bins b JOIN fn ON fn.source = b.source AND fn.bin = b.bin + 1
      WHERE b.used + fn.first_n <= 256
    """).count()
    assert(loose == 0L, "greedy packing left mergeable adjacent bins")
  }

  test("q_decontaminate flags only training docs, with positive hit counts") {
    assume(haveData)
    val d = SparkEntry.queries("q_decontaminate")(spark, dir)
    val rows = d.collect()
    assert(rows.forall(r => r.getLong(0) % 29 != 0), "eval docs must not be flagged")
    assert(rows.forall(r => r.getLong(1) > 0 && r.getLong(2) >= r.getLong(1)),
      "n_gram_hits >= n_eval_docs >= 1 per flagged doc")
  }

  test("q_vocab: ranks dense, counts monotone, coverage cumsum exact and bounded") {
    assume(haveData)
    val v = SparkEntry.queries("q_vocab")(spark, dir).collect()
    assert(v.nonEmpty && v.length <= 100)
    val ranks = v.map(_.getLong(0))
    assert(ranks.toSeq == (1L to v.length).toSeq, "rnk must be dense 1..V in order")
    val freqs = v.map(_.getLong(2))
    assert(freqs.zip(freqs.tail).forall { case (a, b) => a >= b }, "freq non-increasing")
    val cums = v.map(_.getLong(3))
    assert(cums.toSeq == freqs.scanLeft(0L)(_ + _).tail.toSeq, "cum_freq = running sum")
    val total = v.head.getLong(4)
    assert(v.forall(_.getLong(4) == total) && cums.last <= total,
      "one corpus total, coverage <= total")
  }

  test("q_oov: every doc scored, 0 <= n_oov <= n_tokens, vocab tokens never OOV") {
    assume(haveData)
    val o = SparkEntry.queries("q_oov")(spark, dir)
    o.createOrReplaceTempView("oov")
    assert(o.count() > 0)
    val bad = spark.sql(
      """SELECT * FROM oov
         WHERE n_oov < 0 OR n_oov > n_tokens OR n_tokens <= 0""").count()
    assert(bad == 0L)
    // a doc of ONLY top-vocab tokens must score n_oov = 0: the most
    // frequent token alone is in-vocab by construction
    val top = SparkEntry.queries("q_vocab")(spark, dir).collect().head.getString(1)
    spark.sql(
      s"""SELECT doc_id FROM parquet.`$dir/documents.parquet`
          WHERE NOT exists(split(text, ' '), x -> x != '$top')
            AND size(split(text, ' ')) > 0""")
      .collect().foreach { r =>
        val row = o.where(s"doc_id = ${r.getLong(0)}").collect()
        assert(row.forall(_.getLong(2) == 0L))
      }
  }

  test("q_domain_cap keeps at most 20 docs per source, ranks dense from 1") {
    assume(haveData)
    val c = SparkEntry.queries("q_domain_cap")(spark, dir)
    c.createOrReplaceTempView("cap")
    val bad = spark.sql("""
      WITH per AS (SELECT source, count(*) AS kept, min(cap_rank) AS lo,
                          max(cap_rank) AS hi, max(n_source) AS n_source
                   FROM cap GROUP BY source)
      SELECT source FROM per
      WHERE kept > 20 OR lo <> 1 OR hi <> kept OR kept <> least(20, n_source)
    """).count()
    assert(bad == 0L, "cap violated or ranks not dense")
    // determinism: the kept set is a pure function of doc_id hashes —
    // re-running yields the identical selection
    val a = c.select("doc_id").collect().map(_.getLong(0)).toSet
    val b = SparkEntry.queries("q_domain_cap")(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("q_bigram_lm: c_prefix aggregates its bigrams, ordering total and deterministic") {
    assume(haveData)
    val rows = SparkEntry.queries("q_bigram_lm")(spark, dir).collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      assert(r.getLong(2) >= 1 && r.getLong(3) >= r.getLong(2),
        "c_prefix >= c_bigram >= 1")
    }
    val counts = rows.map(_.getLong(2))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
    // c_prefix is the SAME number for every bigram sharing w1
    val byW1 = rows.groupBy(_.getString(0)).values
    assert(byW1.forall(g => g.map(_.getLong(3)).distinct.length == 1))
  }
}
