package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document deduplication operators for large-scale training-data pipelines.
  *
  * All variants are pure DataFrame compositions (codegen'd built-ins, no
  * driver-side loops) and are designed around one shuffle pattern:
  * candidate generation by bucket key, bucket-local pair join, then an
  * anti-join to drop losers. At 100 TB the bucket join is the scaling
  * knob — AQE skew-join handles hot buckets, and every hash is computed
  * from fixed seeds so results are reproducible across runs/clusters.
  *
  * Dedup policy everywhere: a document is dropped iff some *smaller id*
  * document is near-identical to it ("keep first", deterministic).
  */
object Dedup {

  private val P31 = 2147483647L // 2^31 - 1, Mersenne prime

  // shift functions with Column shift amounts (the Scala wrappers take Int)
  private def shl(c: Column, n: Column): Column = call_function("shiftleft", c, n)
  private def shr(c: Column, n: Column): Column = call_function("shiftright", c, n)

  /** Exact dedup on arbitrary key columns: keeps the min-id row per key.
    * Single hash-shuffle on the key; map-side combine via min().
    */
  def exact(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame = {
    val keep = df.groupBy(keyCols.map(col): _*)
      .agg(min(col(idCol)).as(idCol))
      .select(idCol)
    df.join(keep, Seq(idCol), "left_semi")
  }

  /** 31-bit shingle hashes for a text column: k-char shingles -> xxhash64
    * (fixed seed 42) -> mod 2^31-1. Distinct, as a deduped array.
    */
  def shingleHashes(text: Column, k: Int): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(length(text) - (k - 1), lit(1))),
      i => pmod(xxhash64(text.substr(i, lit(k))), lit(P31))))

  /** MinHash signature of a 31-bit shingle-hash array, using fixed
    * linear-congruential hash functions h_i(x) = (a_i x + b_i) mod (2^31-1).
    * Coefficients derive from a fixed seed so signatures are reproducible.
    */
  def minhashSignature(shingles: Column, numHashes: Int): Column = {
    val rnd = new scala.util.Random(42)
    val coeffs = Seq.fill(numHashes)((rnd.nextInt(Int.MaxValue - 1).toLong + 1,
                                      rnd.nextInt(Int.MaxValue).toLong))
    array(coeffs.map { case (a, b) =>
      array_min(transform(shingles, x => (lit(a) * x + lit(b)) % lit(P31)))
    }: _*)
  }

  /** MinHash + LSH near-dup removal.
    * Pipeline: shingle -> signature -> band buckets -> bucket-local pair
    * join -> signature-similarity filter -> drop larger ids.
    *
    * @param threshold estimated-Jaccard threshold (fraction of equal
    *                  signature positions) at or above which the larger id
    *                  is dropped.
    */
  def minhashLsh(df: DataFrame, idCol: String, textCol: String,
                 k: Int = 5, numHashes: Int = 128, bands: Int = 16,
                 threshold: Double = 0.8): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rowsPerBand = numHashes / bands

    val sigs = df.select(col(idCol).as("__id"),
      minhashSignature(shingleHashes(col(textCol), k), numHashes).as("__sig"))

    // (id, band, bandHash): hash of each signature slice
    val banded = sigs.select(col("__id"), col("__sig"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(slice(col("__sig"), b * rowsPerBand + 1, lit(rowsPerBand))))))
      .select(col("__id"), col("__sig"), col("pos").as("__band"), col("col").as("__bh"))

    val l = banded.select(col("__band"), col("__bh"), col("__id").as("__lid"), col("__sig").as("__lsig"))
    val r = banded.select(col("__band"), col("__bh"), col("__id").as("__rid"), col("__sig").as("__rsig"))
    val pairs = l.join(r, Seq("__band", "__bh")).where(col("__lid") < col("__rid"))
      .select(col("__lid"), col("__rid"), col("__lsig"), col("__rsig"))
      .dropDuplicates("__lid", "__rid")

    val simFrac = aggregate(
      zip_with(col("__lsig"), col("__rsig"), (a, b) => when(a === b, 1).otherwise(0)),
      lit(0), (acc, x) => acc + x).cast("double") / lit(numHashes)

    val losers = pairs.where(simFrac >= threshold)
      .select(col("__rid").as(idCol)).distinct()

    df.join(losers, Seq(idCol), "left_anti")
  }

  /** 64-bit SimHash fingerprint of whitespace tokens: per bit, tokens vote
    * +1/-1 by their hash bit; fingerprint bit set iff votes > 0.
    */
  def simhash(text: Column): Column = {
    val tokens = regexp_extract_all(text, lit("\\S+"), lit(0))
    val hashes = transform(tokens, t => xxhash64(t))
    aggregate(sequence(lit(0), lit(63)), lit(0L), (acc, b) =>
      acc + when(
        aggregate(hashes, lit(0),
          (v, h) => v + when(shr(h, b).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)) > 0,
        shl(lit(1L), b)).otherwise(0L))
  }

  /** SimHash near-dup removal: candidates share one of four 16-bit bands;
    * verified by Hamming distance <= maxHamming; larger ids dropped.
    */
  def simhashDedup(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val fps = df.select(col(idCol).as("__id"), simhash(col(textCol)).as("__fp"))
    val banded = fps.select(col("__id"), col("__fp"),
        posexplode(transform(sequence(lit(0), lit(3)),
          i => shr(col("__fp"), i * lit(16)).bitwiseAND(lit(0xFFFFL)))))
      .select(col("__id"), col("__fp"), col("pos").as("__band"), col("col").as("__bh"))
    val l = banded.select(col("__band"), col("__bh"), col("__id").as("__lid"), col("__fp").as("__lfp"))
    val r = banded.select(col("__band"), col("__bh"), col("__id").as("__rid"), col("__fp").as("__rfp"))
    val losers = l.join(r, Seq("__band", "__bh")).where(col("__lid") < col("__rid"))
      .where(bit_count(col("__lfp").bitwiseXOR(col("__rfp"))) <= maxHamming)
      .select(col("__rid").as(idCol)).distinct()
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** Exact n-gram Jaccard similarity of two texts (distinct shingle sets). */
  def ngramJaccard(a: Column, b: Column, k: Int): Column = {
    val sa = shingleHashes(a, k)
    val sb = shingleHashes(b, k)
    val inter = size(array_intersect(sa, sb))
    val uni = size(array_union(sa, sb))
    when(uni === 0, lit(0.0)).otherwise(inter.cast("double") / uni.cast("double"))
  }

  /** Exact n-gram-Jaccard near-dup removal, LSH-pruned: MinHash bands
    * propose candidates, exact shingle Jaccard verifies.
    */
  def ngramJaccardDedup(df: DataFrame, idCol: String, textCol: String,
                        k: Int = 5, threshold: Double = 0.8): DataFrame = {
    val base = df.select(col(idCol).as("__id"), col(textCol).as("__text"))
    val withSh = base.select(col("__id"), shingleHashes(col("__text"), k).as("__sh"),
      minhashSignature(shingleHashes(col("__text"), k), 32).as("__sig"))
    val banded = withSh.select(col("__id"), col("__sh"),
        posexplode(transform(sequence(lit(0), lit(7)),
          b => xxhash64(slice(col("__sig"), b * 4 + 1, lit(4))))))
      .select(col("__id"), col("__sh"), col("pos").as("__band"), col("col").as("__bh"))
    val l = banded.select(col("__band"), col("__bh"), col("__id").as("__lid"), col("__sh").as("__lsh"))
    val r = banded.select(col("__band"), col("__bh"), col("__id").as("__rid"), col("__sh").as("__rsh"))
    val inter = size(array_intersect(col("__lsh"), col("__rsh")))
    val uni = size(array_union(col("__lsh"), col("__rsh")))
    val jac = when(uni === 0, lit(0.0)).otherwise(inter.cast("double") / uni.cast("double"))
    val losers = l.join(r, Seq("__band", "__bh")).where(col("__lid") < col("__rid"))
      .dropDuplicates("__lid", "__rid")
      .where(jac >= threshold)
      .select(col("__rid").as(idCol)).distinct()
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** Exact n-gram-Jaccard near-dup removal over ALL pairs, with string
    * shingles (no hashing) — the oracle-checkable reference path; use
    * `ngramJaccardDedup` (LSH-pruned) at scale.
    */
  def ngramJaccardDedupExact(df: DataFrame, idCol: String, textCol: String,
                             k: Int = 5, threshold: Double = 0.8): DataFrame = {
    val shingles = array_distinct(transform(
      sequence(lit(1), greatest(length(col(textCol)) - (k - 1), lit(1))),
      i => col(textCol).substr(i, lit(k))))
    val base = df.select(col(idCol).as("__id"), shingles.as("__sh"))
    val l = base.select(col("__id").as("__lid"), col("__sh").as("__lsh"))
    val r = base.select(col("__id").as("__rid"), col("__sh").as("__rsh"))
    val inter = size(array_intersect(col("__lsh"), col("__rsh")))
    val uni = size(array_union(col("__lsh"), col("__rsh")))
    val jac = when(uni === 0, lit(0.0)).otherwise(inter.cast("double") / uni.cast("double"))
    val losers = l.crossJoin(r).where(col("__lid") < col("__rid"))
      .where(jac >= threshold)
      .select(col("__rid").as(idCol)).distinct()
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** Embedding cosine near-dup removal, exact (all pairs): quantizes
    * components to integers (round(x * 10000)) so dot products and norms
    * are exact and results engine-reproducible; drops the larger id of any
    * pair with cosine >= threshold.
    *
    * O(n^2) pair join — correct-but-small-scale reference path; the LSH
    * variant below is the 100 TB path.
    */
  def embeddingDedupExact(df: DataFrame, idCol: String, embCol: String,
                          threshold: Double = 0.99): DataFrame = {
    val q = df.select(col(idCol).as("__id"),
      transform(col(embCol), x => round(x.cast("double") * 10000).cast("long")).as("__q"))
    val withNorm = q.select(col("__id"), col("__q"),
      aggregate(col("__q"), lit(0L), (acc, x) => acc + x * x).as("__n2"))
    val l = withNorm.select(col("__id").as("__lid"), col("__q").as("__lq"), col("__n2").as("__ln2"))
    val r = withNorm.select(col("__id").as("__rid"), col("__q").as("__rq"), col("__n2").as("__rn2"))
    val dot = aggregate(zip_with(col("__lq"), col("__rq"), (a, b) => a * b),
      lit(0L), (acc, x) => acc + x)
    val cos = dot.cast("double") / (sqrt(col("__ln2").cast("double")) * sqrt(col("__rn2").cast("double")))
    val losers = l.crossJoin(r).where(col("__lid") < col("__rid"))
      .where(cos >= threshold)
      .select(col("__rid").as(idCol)).distinct()
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** Embedding near-dup removal via random-hyperplane LSH: 16 sign bits
    * (fixed pseudo-random hyperplanes) bucket the vectors; exact quantized
    * cosine verifies candidates within a bucket. Near-identical vectors
    * land in the same bucket with high probability; linear shuffle cost.
    */
  def embeddingDedupLsh(df: DataFrame, idCol: String, embCol: String,
                        threshold: Double = 0.99, planes: Int = 16): DataFrame = {
    val dim = 64
    val rnd = new scala.util.Random(7)
    // fixed hyperplanes, components in [-1, 1)
    val hp: Seq[Seq[Double]] = Seq.fill(planes)(Seq.fill(dim)(rnd.nextDouble() * 2 - 1))
    val q = df.select(col(idCol).as("__id"),
      transform(col(embCol), x => round(x.cast("double") * 10000).cast("long")).as("__q"))
    val bucket = hp.zipWithIndex.map { case (plane, i) =>
      val dot = aggregate(
        zip_with(col("__q"), array(plane.map(lit): _*),
          (a, b) => a.cast("double") * b),
        lit(0.0), (acc, x) => acc + x)
      when(dot >= 0, shiftleft(lit(1L), i)).otherwise(0L)
    }.reduce(_ + _)
    val withB = q.select(col("__id"), col("__q"),
      aggregate(col("__q"), lit(0L), (acc, x) => acc + x * x).as("__n2"),
      bucket.as("__bucket"))
    val l = withB.select(col("__bucket"), col("__id").as("__lid"), col("__q").as("__lq"), col("__n2").as("__ln2"))
    val r = withB.select(col("__bucket"), col("__id").as("__rid"), col("__q").as("__rq"), col("__n2").as("__rn2"))
    val dot = aggregate(zip_with(col("__lq"), col("__rq"), (a, b) => a * b),
      lit(0L), (acc, x) => acc + x)
    val cos = dot.cast("double") / (sqrt(col("__ln2").cast("double")) * sqrt(col("__rn2").cast("double")))
    val losers = l.join(r, Seq("__bucket")).where(col("__lid") < col("__rid"))
      .where(cos >= threshold)
      .select(col("__rid").as(idCol)).distinct()
    df.join(losers, Seq(idCol), "left_anti")
  }
}
