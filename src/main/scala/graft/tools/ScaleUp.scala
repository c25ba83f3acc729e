package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession

/** Synthesizes an sf1-equivalent testdata directory from sf0.1 for
  * scale-divergence runs (the driver ships sf0.001/0.01/0.1 only):
  * each scaled table is `factor` copies of the original, perturbed so
  * the DENSITY of the structure the heavy operators feed on stays
  * constant instead of exploding:
  *
  *  - `documents`: per-copy alphabet permutation over the text (every
  *    shingle changes, so copies are NOT near-dups of each other) with
  *    offset doc_ids — each copy is an independent population with the
  *    original's internal dup structure, so near-dup pair volume scales
  *    ~linearly, which is what "10x the corpus" means for a dedup at
  *    constant dup rate. A naive 10x replication would instead make
  *    every doc a 10-way near-dup cluster — a pair EXPLOSION no real
  *    corpus growth produces.
  *  - `customer`/`supplier`: same permutation over names
  *    (letters+digits), offset keys — fuzzy-join gram populations
  *    replicate without cross-copy collisions.
  *  - `events`: user_id/event_id offset per copy, timestamps untouched —
  *    10x keys at the original per-key density (the horizontal-growth
  *    axis keyed operators shard on).
  *  - `part`/`orders`/`lineitem` (r11): the TPC-H fact chain, copied
  *    with FK-consistent key offsets (o_custkey follows customer's copy
  *    offset, lineitem's keys follow orders/part/supplier) — each copy
  *    is an independent sub-corpus at the original join selectivity.
  *  - `embeddings` (r11): per-copy cyclic dimension rotation —
  *    norm-preserving new unit vectors, not coincident clones.
  *  - `region`/`nation`: copied as-is (tiny dims; per-copy FKs into
  *    them intentionally unchanged, preserving nation density).
  *
  * Usage: runMain graft.tools.ScaleUp <inDir> <outDir> <factor>
  */
object ScaleUp {

  private val Lower = "abcdefghijklmnopqrstuvwxyz"
  private val Upper = Lower.toUpperCase
  private val Digits = "0123456789"

  /** Per-copy deterministic character bijection (copy 0 = identity).
    *
    * Through r11 this was an alphabet ROTATION by i*7 (letters) / i*3
    * (digits) — which is the identity whenever the shift hits a multiple
    * of the alphabet size: at factor 100, copies 26/52/78 repeat the
    * letter map and EVERY 10th copy repeats the digit map. Customer and
    * supplier names are mostly digits, so a 100x scale-up produced
    * 10-way textual clone groups and the fuzzy-join candidate volume
    * grew with copies squared — the measured 100x slope was the
    * synthesizer's clones, not the operator (the same bug class ADVICE
    * r11 flagged for the embedding rotation, one table over). Now each
    * copy gets a seeded Fisher-Yates PERMUTATION of each alphabet
    * (re-seeded in the astronomically-unlikely identity case), so no
    * factor has a cycle and cross-copy texts share only
    * coincidence-level n-grams, while within-copy structure is
    * preserved exactly (bijection). */
  private def rotated(i: Int): (String, String) = {
    val id = Lower + Upper + Digits
    if (i == 0) (id, id)
    else {
      def shuffled(s: String, seed: Long): String = {
        val arr = s.toCharArray
        val rnd = new java.util.Random(seed)
        var j = arr.length - 1
        while (j > 0) {
          val k = rnd.nextInt(j + 1)
          val t = arr(j); arr(j) = arr(k); arr(k) = t
          j -= 1
        }
        new String(arr)
      }
      def nonIdentity(s: String, seed: Long): String = {
        var bump = 0L
        var r = shuffled(s, seed)
        while (r == s) { bump += 1; r = shuffled(s, seed + 7919L * bump) }
        r
      }
      (id, nonIdentity(Lower, 1000003L * i) +
        nonIdentity(Upper, 2000003L * i) +
        nonIdentity(Digits, 3000017L * i))
    }
  }

  def main(args: Array[String]): Unit = {
    val in = args(0); val out = args(1); val factor = args(2).toInt
    val spark: SparkSession = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def copies(t: String)(xform: (DataFrame, Int) => DataFrame): DataFrame = {
      val base = spark.read.parquet(s"$in/$t.parquet")
      (0 until factor).map(i => xform(base, i)).reduce(_ unionAll _)
    }
    // id offsets derive from the ACTUAL max id, not a hardcoded row
    // count: the driver regenerates testdata between rounds, and a
    // grown corpus with a fixed offset would alias copies' ids into each
    // other — silently corrupting every dedup measured on the result
    def idOffset(t: String, idCol: String): Long =
      spark.read.parquet(s"$in/$t.parquet")
        .agg(max(col(idCol))).head().getLong(0) + 1

    val docOffset = idOffset("documents", "doc_id")
    // EVERY key offset derives from the actual max id (see idOffset
    // note) — including the dim/fact chain below, where the SAME val is
    // shared by the dim table and every fact FK referencing it, so FK
    // consistency cannot drift between duplicated expressions
    val custOffset = idOffset("customer", "c_custkey")
    val suppOffset = idOffset("supplier", "s_suppkey")
    val ordOffset = idOffset("orders", "o_orderkey")
    val partOffset = idOffset("part", "p_partkey")
    val scaled: Map[String, DataFrame] = Map(
      "documents" -> copies("documents") { (df, i) =>
        val (from, to) = rotated(i)
        df.withColumn("doc_id", col("doc_id") + lit(i * docOffset))
          .withColumn("text", translate(col("text"), from, to))
      },
      "customer" -> copies("customer") { (df, i) =>
        val (from, to) = rotated(i)
        df.withColumn("c_custkey", col("c_custkey") + lit(i * custOffset))
          .withColumn("c_name", translate(col("c_name"), from, to))
      },
      "supplier" -> copies("supplier") { (df, i) =>
        val (from, to) = rotated(i)
        df.withColumn("s_suppkey", col("s_suppkey") + lit(i * suppOffset))
          .withColumn("s_name", translate(col("s_name"), from, to))
      },
      "events" -> {
        val userOffset = idOffset("events", "user_id")
        val eventOffset = idOffset("events", "event_id")
        copies("events") { (df, i) =>
          df.withColumn("user_id", col("user_id") + lit(i * userOffset))
            .withColumn("event_id", col("event_id") + lit(i * eventOffset))
        }
      },
      // TPC-H fact chain (r11): copies with FK-CONSISTENT offsets —
      // orders' o_custkey moves with customer's copy offset, lineitem's
      // l_orderkey/l_partkey/l_suppkey with orders'/part's/supplier's —
      // so every copy is an independent sub-corpus with the original's
      // join selectivity (10x facts at constant per-key density, the
      // same growth contract as the documents rotation)
      "part" -> copies("part") { (df, i) =>
        df.withColumn("p_partkey", col("p_partkey") + lit(i * partOffset))
      },
      "orders" -> copies("orders") { (df, i) =>
        df.withColumn("o_orderkey", col("o_orderkey") + lit(i * ordOffset))
          .withColumn("o_custkey", col("o_custkey") + lit(i * custOffset))
      },
      "lineitem" -> copies("lineitem") { (df, i) =>
        df.withColumn("l_orderkey", col("l_orderkey") + lit(i * ordOffset))
          .withColumn("l_partkey", col("l_partkey") + lit(i * partOffset))
          .withColumn("l_suppkey", col("l_suppkey") + lit(i * suppOffset))
      },
      "embeddings" -> {
        // per-copy cyclic rotation of the embedding dims: every copy is
        // a different set of unit vectors (norm-preserving, so cosine
        // geometry stays representative) rather than 10 exact clones of
        // each point — a 10x replication would hand every ANN probe 10
        // coincident neighbors and make recall trivially flat
        val vecOffset = idOffset("embeddings", "vec_id")
        copies("embeddings") { (df, i) =>
          if (i == 0) df // the original corpus, unrotated
          else {
            // shift in [1, dim-1] for EVERY copy: the old i*7 was an
            // exact clone whenever i*7 ≡ 0 mod dim (ADVICE r11 — e.g.
            // dim 7 or 14 inside a 10x scale-up), silently defeating
            // the "no coincident neighbors" contract the ANN recall
            // measurement rests on. Derived from the actual embedding
            // size, so no dim can zero it.
            val shift = s"((($i - 1) % (size(embedding) - 1)) + 1)"
            df.withColumn("vec_id", col("vec_id") + lit(i * vecOffset))
              .withColumn("embedding", expr(
                s"concat(slice(embedding, $shift + 1, " +
                s"size(embedding) - $shift), " +
                s"slice(embedding, 1, $shift))"))
          }
        }
      })

    GraftSession.tables.foreach { t =>
      val df = scaled.getOrElse(t, spark.read.parquet(s"$in/$t.parquet"))
      df.write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"[scaleup] $t -> ${spark.read.parquet(s"$out/$t.parquet").count()} rows")
    }
    spark.stop()
  }
}
