package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SemDedup

/** Behavior pins for cluster-scoped semantic dedup: planted near-dups
  * (the driver embeddings are random unit vectors with no cos>=0.9
  * pairs), the within-cluster-only comparison contract, and the
  * participant cap.
  */
class SemDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** 4-dim unit-ish vectors: ids 0..3 are four orthogonal seeds; 10/11
    * are near-dups of seed 0's direction; 12 is a near-dup of seed 1's;
    * 20 sits alone near seed 2.
    */
  private def vecs = {
    import spark.implicits._
    Seq(
      (0L, Seq(1f, 0f, 0f, 0f)),
      (1L, Seq(0f, 1f, 0f, 0f)),
      (2L, Seq(0f, 0f, 1f, 0f)),
      (3L, Seq(0f, 0f, 0f, 1f)),
      (10L, Seq(0.99f, 0.1f, 0f, 0f)),
      (11L, Seq(0.98f, 0.15f, 0f, 0f)),
      (12L, Seq(0.1f, 0.99f, 0f, 0f)),
      (20L, Seq(0.5f, 0f, 0.85f, 0f))  // cos vs seed 2 = 0.86 < 0.9
    ).toDF("vec_id", "embedding")
  }

  test("drops the higher id of within-cluster near-dup pairs, keeps singletons") {
    val out = SemDedup.semanticDedup(vecs, "vec_id", "embedding",
        numSeeds = 4, threshold = 0.9)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // cluster of seed 0: {0, 10, 11} all pairwise cos>=0.9 -> only 0 survives
    assert(out.contains(0L) && !out.contains(10L) && !out.contains(11L))
    // cluster of seed 1: {1, 12} cos>=0.9 -> 1 survives
    assert(out.contains(1L) && !out.contains(12L))
    // 20 is near seed 2 but below threshold vs 2 -> both survive
    assert(out.contains(2L) && out.contains(20L))
    assert(out.contains(3L))
    // assignments are to the nearest seed
    assert(out(20L) == 2L && out(3L) == 3L)
  }

  test("comparison is cluster-scoped: cross-cluster near-dups both survive") {
    import spark.implicits._
    // 30 is nearly parallel to 10 but its best seed is 1 (rotated): plant
    // a pair with cos>=0.9 whose members land in different clusters.
    val df = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)),
      (1L, Seq(0.6f, 0.8f, 0f, 0f)),
      // seeds sit at 0 deg and 53.1 deg; the cluster boundary is 26.6 deg
      // and the cos>=0.9 radius is 25.8 deg. 10 at 26.2 deg (cluster 0,
      // cos vs seed 0 = 0.897 < 0.9), 30 at 27.0 deg (cluster 1, cos vs
      // seed 1 = 0.898 < 0.9); cos(10,30) = cos(0.8 deg) = 0.9999.
      (10L, Seq(0.8973f, 0.4415f, 0f, 0f)),
      (30L, Seq(0.8910f, 0.4540f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val out = SemDedup.semanticDedup(df, "vec_id", "embedding",
        numSeeds = 2, threshold = 0.9)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(10L) == 0L && out(30L) == 1L) // different clusters
    assert(out.contains(10L) && out.contains(30L)) // never compared
  }

  test("participant cap: maxCluster=1 disables pairing, everything survives") {
    val out = SemDedup.semanticDedup(vecs, "vec_id", "embedding",
        numSeeds = 4, threshold = 0.9, maxCluster = 1)
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(out == Seq(0L, 1L, 2L, 3L, 10L, 11L, 12L, 20L))
  }

  test("kmeans variant drops planted near-dups, keeps distinct vectors") {
    val out = SemDedup.semanticDedupKmeans(vecs, "vec_id", "embedding",
        nlist = 4, threshold = 0.9)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // whatever the trained cells look like, 10/11 share a cell with 0 or
    // each other (cos ~1 vectors always co-assign under nearest-centroid)
    // and must lose to a lower id; 12 likewise; distinct vectors survive
    assert(!out.contains(10L) && !out.contains(11L) && !out.contains(12L))
    assert(out.contains(0L) && out.contains(1L) && out.contains(2L) &&
      out.contains(3L) && out.contains(20L))
  }

  test("r19 containment pushdown: kmLosers-restricted exact pass equals the full exact anti-join") {
    // pins the q_semdedup_kmeans rewrite: exactSurv ∖ kmSurv computed the
    // original way (full O(n²) exact dedup, then anti-join) must equal the
    // entry's pushed-down form (exact pairs restricted to km LOSERS) on
    // real data with the entry's exact parameters. One km frame feeds both
    // sides, so only the exact-pass restriction is under test.
    val dir = new java.io.File("/root/testdata/sf0.001")
    assume(dir.exists())
    import graft.operators.Dedup
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val km = SemDedup.semanticDedupKmeans(emb, "vec_id", "embedding",
      nlist = 16, threshold = 0.35)
    val missingFull = Dedup.embeddingDedupExact(emb, "vec_id", "embedding", 0.35)
      .select("vec_id")
      .join(km.select(col("vec_id")), Seq("vec_id"), "left_anti")
      .collect().map(_.getLong(0)).toSet
    val kmLosers = emb.select(col("vec_id"))
      .join(km.select(col("vec_id")), Seq("vec_id"), "left_anti")
    val withN = emb.select(col("vec_id").as("__id"),
        Dedup.quantizeEmbedding(col("embedding")).as("__q"))
      .select(col("__id"), col("__q"),
        graft.functions.ArrayMath.norm2Long(col("__q")).as("__n2"))
    val loseSide = withN
      .join(kmLosers.select(col("vec_id").as("__id")), Seq("__id"))
      .select(col("__id").as("__rid"), col("__q").as("__rq"), col("__n2").as("__rn2"))
    val allSide = withN.select(col("__id").as("__lid"),
      col("__q").as("__lq"), col("__n2").as("__ln2"))
    val cosE = graft.functions.ArrayMath.dotLong(col("__lq"), col("__rq"))
      .cast("double") / (sqrt(col("__ln2").cast("double")) *
        sqrt(col("__rn2").cast("double")))
    val exactLosersAmongKmLosers = allSide.crossJoin(loseSide)
      .where(col("__lid") < col("__rid")).where(cosE >= 0.35)
      .select(col("__rid").as("vec_id")).distinct()
    val missingPushed = kmLosers
      .join(exactLosersAmongKmLosers, Seq("vec_id"), "left_anti")
      .collect().map(_.getLong(0)).toSet
    assert(missingPushed == missingFull)
    // and the containment theorem itself holds on this data
    assert(missingFull.isEmpty)
  }

  test("matches a brute-force within-cluster replay on real sf0.001 embeddings") {
    val dir = new java.io.File("/root/testdata/sf0.001")
    assume(dir.exists())
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val tau = 0.3 // sf0.001 has few high-cos pairs; 0.3 yields real signal
    val got = SemDedup.semanticDedup(emb, "vec_id", "embedding",
        numSeeds = 4, threshold = tau)
      .select("vec_id").collect().map(_.getLong(0)).toSet

    // replay: same quantized assignment, then per-cluster all-pairs
    val q = emb.select(col("vec_id"),
      transform(col("embedding"), x => round(x.cast("double") * 10000).cast("long")).as("qv"))
    val seeds = q.orderBy("vec_id").limit(4).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    val rows = q.collect().map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    val assign = rows.map { case (id, v) =>
      val best = seeds.map { case (sid, sv) => (dot(v, sv), -sid) }.max
      (id, -best._2, v, dot(v, v))
    }
    val losers = (for {
      a <- assign; b <- assign
      if a._2 == b._2 && a._1 < b._1
    } yield (a, b)).collect { case (a, b)
      if dot(a._3, b._3).toDouble / (math.sqrt(a._4.toDouble) * math.sqrt(b._4.toDouble)) >= tau =>
        b._1
    }.toSet
    val expect = assign.map(_._1).toSet -- losers
    assert(got == expect)
    assert(losers.nonEmpty, "threshold should produce real dedup signal")
  }
}
