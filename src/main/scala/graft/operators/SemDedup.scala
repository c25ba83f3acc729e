package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.ArrayMath

/** SemDeDup-style cluster-scoped semantic dedup (Abbas et al. 2023,
  * arXiv:2303.09540): cluster the embedding space, compare pairs ONLY
  * within a cluster, and drop all but the lowest-id member of every
  * near-duplicate pair. The clustering turns the O(n^2) all-pairs cosine
  * scan into k independent O((n/k)^2) blocks — at 100 TB with k in the
  * tens of thousands each block is small enough for one executor, and the
  * only shuffle is the hash-partition on cluster id.
  *
  * Two coarse-clustering front-ends over ONE shared pruning stage:
  *
  *  - [[semanticDedup]] — nearest-of-`numSeeds` FIXED seed exemplars (the
  *    lowest-id vectors) by exact integer-quantized dot product
  *    (round(x*10000), the [[Similarity]]/[[Dedup]] contract), ties to
  *    the lowest seed id. Fully deterministic and SQL-replayable — the
  *    driver hash-compares it against a DuckDB replay.
  *  - [[semanticDedupKmeans]] — the paper's actual shape: a trained
  *    coarse quantizer ([[Similarity.ivfBuild]]'s seeded MLlib KMeans,
  *    training-set capped). Reuses the index's cell assignment outright,
  *    so a corpus with a built IVF index gets semantic dedup for free on
  *    top of it. Run-to-run deterministic (seeded), but float-iteration
  *    order isn't ENGINE-portable, so this path is spec-tested rather
  *    than oracle-hashed (the q_ann_ivf precedent).
  *
  * Per-cluster work is bounded: only the first `maxCluster` members per
  * cluster (deterministic md5-hash order, never arrival order)
  * participate in pair comparison; overflow rows pass through unexamined
  * (the same "a hot bucket stops generating candidates" semantics as
  * [[Dedup.capBuckets]], but rank-based so the CAP participants are still
  * deduped). Cosine compares run on exact integer dots/norms widened to
  * double with one IEEE expression — bit-identical in any engine.
  */
object SemDedup {

  private def quantize(emb: Column): Column =
    transform(emb, x => round(x.cast("double") * 10000).cast("long"))

  /** md5-prefix deterministic order key (the hash60 contract used by
    * domain-cap sampling): stable under retries and input order. */
  private def hashKey(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 15), 16, 10).cast("long")

  /** Survivors of semantic dedup with their cluster assignment:
    * `(idCol, cluster)` — one row per input vector that is NOT the
    * higher-id member of a within-cluster pair with cosine >= threshold.
    *
    * @param numSeeds   coarse clusters (seed exemplars = lowest-id rows)
    * @param threshold  cosine cut for "semantic duplicate"
    * @param maxCluster pair-comparison participants per cluster
    */
  def semanticDedup(df: DataFrame, idCol: String, embCol: String,
                    numSeeds: Int = 8, threshold: Double = 0.35,
                    maxCluster: Int = 10000): DataFrame = {
    val q = df.select(col(idCol).as("__id"), quantize(col(embCol)).as("__q"))

    // Seed exemplars: <= numSeeds rows to the driver — the same bounded
    // collect as an IVF centroid table; broadcast back as literals so the
    // per-row assignment is a codegen'd chain of integer dots, no join.
    val seeds: Array[(Long, Array[Long])] =
      q.orderBy("__id").limit(numSeeds)
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    require(seeds.nonEmpty, "semanticDedup: input is empty")

    // argmax over seed dots, ties to the lowest seed id: structs compare
    // lexicographically, so max(struct(dot, -sid)) picks exactly that.
    val cands = seeds.map { case (sid, w) =>
      struct(
        ArrayMath.dotLong(col("__q"), array(w.map(lit).toIndexedSeq: _*)).as("d"),
        lit(-sid).as("ns"))
    }.toIndexedSeq
    val best = if (cands.size == 1) cands.head else greatest(cands: _*)
    val assigned = q.select(col("__id"), col("__q"),
        ArrayMath.norm2Long(col("__q")).as("__n2"),
        (-best.getField("ns")).as("cluster"))
    pruneWithinClusters(assigned, idCol, threshold, maxCluster)
  }

  /** The SemDeDup paper's clustering front-end: a seeded KMeans coarse
    * quantizer via [[Similarity.ivfBuild]] (training capped at
    * `maxTrainRows`; the corpus-side assignment is a map-side transform,
    * never a shuffle). `(idCol, cluster)` survivors as [[semanticDedup]].
    */
  def semanticDedupKmeans(df: DataFrame, idCol: String, embCol: String,
                          nlist: Int = 64, threshold: Double = 0.35,
                          maxCluster: Int = 10000, seed: Long = 13,
                          maxTrainRows: Long = 262144): DataFrame = {
    val idx = Similarity.ivfBuild(df, idCol, embCol, nlist = nlist,
      seed = seed, maxTrainRows = maxTrainRows)
    val assigned = idx.assigned.select(col("nn_id").as("__id"),
      col("__cq").as("__q"), col("__cn2").as("__n2"),
      col("__cell").cast("long").as("cluster"))
    pruneWithinClusters(assigned, idCol, threshold, maxCluster)
  }

  /** Shared pruning stage over an assigned frame
    * `(__id, __q, __n2, cluster)`: md5-rank participant cap, one
    * cluster-keyed self-join (the ranking exchange is planned once and
    * reused for both sides), exact quantized-cosine verify, anti-join of
    * the higher-id pair members (AQE broadcasts the loser set).
    */
  private def pruneWithinClusters(assigned: DataFrame, idCol: String,
                                  threshold: Double, maxCluster: Int): DataFrame = {
    val ranked = assigned.withColumn("__cr",
      row_number().over(Window.partitionBy(col("cluster"))
        .orderBy(hashKey(col("__id")), col("__id"))))
    val part = ranked.where(col("__cr") <= maxCluster)

    val l = part.select(col("cluster"), col("__id").as("__lid"),
      col("__q").as("__lq"), col("__n2").as("__ln2"))
    val r = part.select(col("cluster"), col("__id").as("__rid"),
      col("__q").as("__rq"), col("__n2").as("__rn2"))
    val cos = ArrayMath.dotLong(col("__lq"), col("__rq")).cast("double") /
      (sqrt(col("__ln2").cast("double")) * sqrt(col("__rn2").cast("double")))
    val losers = l.join(r, Seq("cluster")).where(col("__lid") < col("__rid"))
      .where(cos >= threshold)
      .select(col("__rid").as("__id")).distinct()

    assigned.join(losers, Seq("__id"), "left_anti")
      .select(col("__id").as(idCol), col("cluster"))
  }
}
