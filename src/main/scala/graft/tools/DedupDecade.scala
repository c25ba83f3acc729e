package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** The dedup family's third-decade demonstration (VERDICT r13 next-round
  * #5, the FuzzyDecade pattern): the sf0.1→sf10 profiles pinned the batch
  * minhash/ngram/closure slopes at 51.7x/48.1x/30.2x per 100x, but —
  * like the fuzzy pair keys before r13 — the regime that breaks naive
  * LSH is BAND-BUCKET saturation: when many documents share band keys,
  * the bucket-local pair join goes quadratic unless the hot-bucket cap
  * engages. This tool synthesizes that regime directly — documents drawn
  * from a tiny word vocabulary with planted near-dup twins AND large
  * boilerplate clusters (every cluster's docs collide in every band) —
  * and times the three pipelines at n and 10n, reporting each stage's
  * cardinality, how many buckets hit the cap, and the decade slope.
  *
  * The claim under test: the superlinear term is candidate-pair volume in
  * saturated buckets, and `maxBucket` bounds it — a bucket past the cap is
  * EXCLUDED from pair generation (capBuckets: "a bucket that hot is
  * boilerplate, not near-duplication signal"), so the pair join's volume
  * tracks the twin signal, not the boilerplate mass. Each scale therefore
  * also counts the UNCAPPED candidate volume (the counterfactual a naive
  * LSH pays) — the quadratic is measured, not asserted. Correctness under
  * the cap is pinned elsewhere (StreamingDedupSpec cap tests,
  * PropertyParitySpec C2); this tool measures the cost curve.
  *
  * Sized so the cap ENGAGES across the decade: boilerplate clusters hold
  * n/400 copies — under the 200-row cap at n=30k (75/cluster: pair join
  * pays the full clique volume) and over it at 300k (750/cluster:
  * excluded). The uncapped counterfactual at 300k is ~90M raw pairs from
  * 0.05% of the corpus.
  *
  * Usage: runMain graft.tools.DedupDecade <outJson> [n=30000] [maxBucket=200]
  */
object DedupDecade {

  /** n docs: ~60 words from a 40-word vocabulary (long enough that a
    * one-word twin stays above the 0.8 Jaccard threshold: ~56 shared
    * 5-shingles of ~61, J≈0.85); ~1% planted twins (the real near-dup
    * signal), plus 5% of rows drawn from only 20 boilerplate templates
    * (dense clusters of n/400 exact copies each — the band-saturating
    * mass). Deterministic in the row id. */
  private def corpus(spark: SparkSession, n: Long): DataFrame = {
    val words = (0 until 40).map(i => s"w$i")
    val wordsArr = s"array(${words.map(w => s"'$w'").mkString(",")})"
    def wordAt(idExpr: String, i: String) =
      s"""element_at($wordsArr, 1 + cast(conv(substring(md5(concat(cast($idExpr as string), '_', cast($i as string))), 1, 6), 16, 10) % 40 as int))"""
    spark.range(n)
      .withColumn("text",
        expr(s"""concat_ws(' ', transform(sequence(0, 55 + cast(id % 8 as int)),
                 i -> ${wordAt("id", "i")}))"""))
      // planted twin: id % 100 == 1 copies id-1's text with ONE word changed
      .withColumn("text",
        expr(s"""CASE WHEN id % 100 = 1 THEN
                  concat_ws(' ', transform(sequence(0, 55 + cast((id - 1) % 8 as int)),
                    i -> CASE WHEN i = 30 THEN 'twinword' ELSE ${wordAt("(id - 1)", "i")} END))
                 ELSE text END"""))
      // boilerplate mass: 5% of rows collapse onto 20 exact templates
      .withColumn("text",
        expr(s"""CASE WHEN id % 20 = 7 THEN
                  concat_ws(' ', transform(sequence(0, 59),
                    i -> ${wordAt("('tpl' || cast(id % 400 div 20 as string))", "i")}))
                 ELSE text END"""))
      .select(col("id").as("doc_id"), col("text"))
  }

  def main(args: Array[String]): Unit = {
    val outJson = args(0)
    val n = if (args.length > 1) args(1).toLong else 30000L
    val maxBucket = if (args.length > 2) args(2).toInt else 200

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .appName("graft-dedup-decade")
      .config("spark.sql.shuffle.partitions", "32")
      // the GraftSession broadcast policy (see FuzzyDecade): range-derived
      // frames carry bytes-sized static estimates — never broadcast from
      // those; AQE may still convert from measured post-shuffle sizes
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "8388608")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val sb = new StringBuilder("{")
    sb.append(s""""n":$n,"max_bucket":$maxBucket,"scales":{""")
    val scales = Seq(n, n * 10)
    scales.zipWithIndex.foreach { case (rows, si) =>
      val docs = corpus(spark, rows)
      docs.persist().count() // input off the clock; all three read it

      // ---- minhash, with stage cardinalities and cap engagement ----
      val t0 = System.nanoTime()
      val st = Dedup.minhashStages(docs, "doc_id", "text",
        k = 5, numHashes = 128, bands = 16, threshold = 0.8,
        maxBucket = maxBucket)
      val accepted = st.accepted.count()
      val minhashSec = (System.nanoTime() - t0) / 1e9
      // attribution pass (off the clock): banded rows, bucket histogram,
      // candidate volumes — the terms the slope decomposes into
      val banded = st.banded.count()
      val buckets = st.banded.groupBy("__band", "__bk").count()
      val bucketsTotal = buckets.count()
      val bucketsCapped = buckets.where(col("count") > maxBucket).count()
      val maxBucketSize = buckets.agg(max("count")).collect()(0).getLong(0)
      val candsRaw = st.candsRaw.count()
      val cands = st.cands.count()
      System.err.println(f"[dedup-decade] rows=$rows minhash=$minhashSec%.1f s " +
        s"candsRaw=$candsRaw capped=$bucketsCapped/$bucketsTotal max=$maxBucketSize")

      // counterfactual: the UNCAPPED pair volume a naive LSH pays on the
      // same banded rows (count only — the quadratic term, measured)
      val t0u = System.nanoTime()
      val uncapped = Dedup.minhashStages(docs, "doc_id", "text",
        k = 5, numHashes = 128, bands = 16, threshold = 0.8, maxBucket = 0)
        .candsRaw.count()
      val uncappedSec = (System.nanoTime() - t0u) / 1e9
      System.err.println(f"[dedup-decade] rows=$rows uncapped_cands=$uncapped " +
        f"(count pass $uncappedSec%.1f s)")

      // ---- ngram 3-stage screened pipeline ----
      val t1 = System.nanoTime()
      val ngramOut = Dedup.ngramJaccardDedup(docs, "doc_id", "text",
        maxBucket = maxBucket).count()
      val ngramSec = (System.nanoTime() - t1) / 1e9
      System.err.println(f"[dedup-decade] rows=$rows ngram=$ngramSec%.1f s out=$ngramOut")

      // ---- near-dup cluster closure over the accepted edge list ----
      val t2 = System.nanoTime()
      val comps = Dedup.connectedComponents(st.accepted, "__lid", "__rid")
      val nComps = comps.select("c").distinct().count()
      val closureSec = (System.nanoTime() - t2) / 1e9
      Dedup.freeComponents(comps)
      System.err.println(f"[dedup-decade] rows=$rows closure=$closureSec%.1f s comps=$nComps")

      docs.unpersist()
      sb.append(
        f""""$rows":{"minhash_sec":$minhashSec%.2f,"accepted_pairs":$accepted,
            |"banded_rows":$banded,"buckets":$bucketsTotal,
            |"buckets_capped":$bucketsCapped,"max_bucket_size":$maxBucketSize,
            |"cands_raw":$candsRaw,"cands_distinct":$cands,
            |"cands_raw_uncapped":$uncapped,"uncapped_count_sec":$uncappedSec%.2f,
            |"ngram_sec":$ngramSec%.2f,"ngram_out":$ngramOut,
            |"closure_sec":$closureSec%.2f,"components":$nComps}""".stripMargin
          .replace("\n", ""))
      if (si == 0) sb.append(",")
    }
    sb.append("}}")
    Files.write(Paths.get(outJson), sb.toString.getBytes("UTF-8"))
    println(sb.toString)
    spark.stop()
  }
}
