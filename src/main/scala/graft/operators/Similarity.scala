package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Components are quantized to integers (round(x*10000)) before any
  * arithmetic so dot products/norms are exact and rankings deterministic
  * and engine-reproducible; cosine = exact_dot / (sqrt(n1) * sqrt(n2)).
  * Hyperplane weights are integer-quantized too, so bucket sign decisions
  * are exact — the whole pipeline replays in DuckDB (DedupOracles.annLsh).
  *
  * - `bruteForceTopK` — exact baseline: broadcast the (small) query set,
  *   score every corpus vector, per-query top-k. One pass over the corpus,
  *   no shuffle of the corpus itself; at 1000 executors this is the
  *   standard "small probe set x huge corpus" scan shape.
  * - `lshTopK` — scale path: random-hyperplane buckets (fixed seed) with
  *   multi-probe (query probes its bucket and single-bit flips), so only
  *   a fraction of the corpus is scored per query.
  */
object Similarity {

  /** Fixed ANN hyperplanes (seed 11), shared with the DuckDB oracle. */
  def planeCoeffsAnn(planes: Int, dim: Int): Seq[Seq[Long]] =
    Dedup.planeCoeffs(planes, dim, seed = 11)

  private def quantize(emb: Column): Column =
    transform(emb, x => round(x.cast("double") * 10000).cast("long"))

  // codegen'd kernels (graft.functions.DotLong) — the per-candidate hot
  // path; bit-identical to the aggregate(zip_with(...)) higher-order form
  private def norm2(q: Column): Column = graft.functions.ArrayMath.norm2Long(q)

  private def dot(a: Column, b: Column): Column =
    graft.functions.ArrayMath.dotLong(a, b)

  /** Exact cosine top-k: for each query vector, the k nearest corpus
    * vectors (excluding itself), ranked by (cosine desc, id asc).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     embCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("nn_id"), quantize(col(embCol)).as("__cq"))
      .withColumn("__cn2", norm2(col("__cq")))
    val q = queries.select(col(idCol).as("query_id"), quantize(col(embCol)).as("__qq"))
      .withColumn("__qn2", norm2(col("__qq")))
    val cos = dot(col("__qq"), col("__cq")).cast("double") /
      (sqrt(col("__qn2").cast("double")) * sqrt(col("__cn2").cast("double")))
    val scored = c.crossJoin(broadcast(q))
      .where(col("nn_id") =!= col("query_id"))
      .select(col("query_id"), col("nn_id"), cos.as("cosine"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("nn_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "nn_id", "cosine")
  }

  /** A built IVF-Flat index: the quantized corpus with cell assignments
    * plus the centroid table. Build once, search many times — at scale the
    * KMeans train + assignment pass is the expensive part and must not be
    * re-paid per query batch, exactly like a FAISS index file. Persists to
    * parquet ([[saveIndex]]/[[loadIndex]]); on a cluster the assigned side
    * is naturally written bucketed/partitioned by `__cell`, so a search
    * touching `nprobe` cells prunes its scan to those partitions.
    */
  final case class IvfIndex(assigned: DataFrame, centroids: DataFrame)

  /** Trains the coarse quantizer (MLlib KMeans, distributed, seeded) and
    * assigns every corpus vector to its cell (map-side transform; the
    * corpus is never shuffled).
    *
    * @param maxTrainRows quantizer training-set cap: KMeans over the full
    *   corpus is a non-starter at scale and adds nothing — a coarse
    *   quantizer needs only a representative sample (the FAISS guideline
    *   is tens-to-hundreds of points per cell). Corpora at or under the
    *   cap train on everything, so small-corpus results are unchanged.
    */
  /** @param maxIter KMeans iteration cap. A COARSE quantizer doesn't need
    *   converged centroids — cell boundaries move little after a few
    *   iterations and recall is governed by nprobe; 10 halves the training
    *   cost of MLlib's default 20 with no measured recall loss.
    */
  def ivfBuild(corpus: DataFrame, idCol: String, embCol: String,
               nlist: Int = 64, seed: Long = 13,
               maxTrainRows: Long = 262144, maxIter: Int = 10): IvfIndex = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = corpus.sparkSession

    val corpusVec = corpus.select(col(idCol).as("nn_id"), quantize(col(embCol)).as("__cq"))
      .withColumn("__cn2", norm2(col("__cq")))
      .withColumn("__features",
        array_to_vector(transform(col("__cq"), x => x.cast("double"))))
    val total = corpusVec.count()
    val train =
      if (total <= maxTrainRows) corpusVec
      else corpusVec.sample(withReplacement = false,
        math.min(1.0, maxTrainRows.toDouble * 1.05 / total), seed)
    val model = new KMeans().setK(nlist).setSeed(seed).setMaxIter(maxIter)
      .setFeaturesCol("__features").setPredictionCol("__cell")
      .fit(train)
    val assigned = model.transform(corpusVec).drop("__features")

    import spark.implicits._
    val centDf = model.clusterCenters.zipWithIndex.toSeq
      .map { case (v, i) => (i, v.toArray.toSeq) }.toDF("__cell", "__cent")
    IvfIndex(assigned, centDf)
  }

  /** Persist an index: the assigned corpus partitioned by cell (so probe
    * scans prune to the probed cells' files) + the centroid table. */
  def saveIndex(index: IvfIndex, dir: String): Unit = {
    index.assigned.write.mode("overwrite").partitionBy("__cell").parquet(s"$dir/assigned")
    index.centroids.write.mode("overwrite").parquet(s"$dir/centroids")
  }

  def loadIndex(spark: org.apache.spark.sql.SparkSession, dir: String): IvfIndex =
    IvfIndex(spark.read.parquet(s"$dir/assigned"),
      spark.read.parquet(s"$dir/centroids"))

  /** Search a built index: each query scores exact cosine against only its
    * `nprobe` nearest cells (~nprobe/nlist of the corpus). The probe list
    * (queries x nprobe) broadcasts; with a cell-partitioned saved index
    * the corpus scan prunes to the probed cells.
    */
  def ivfSearch(index: IvfIndex, queries: DataFrame, idCol: String,
                embCol: String, k: Int, nprobe: Int = 8): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), quantize(col(embCol)).as("__qq"))
      .withColumn("__qn2", norm2(col("__qq")))
    val l2 = aggregate(
      zip_with(col("__qq"), col("__cent"),
        (x, c) => (x.cast("double") - c) * (x.cast("double") - c)),
      lit(0.0), (acc, x) => acc + x)
    val wc = Window.partitionBy("query_id").orderBy(col("__dist"), col("__cell"))
    val probes = q.crossJoin(broadcast(index.centroids))
      .withColumn("__dist", l2)
      .withColumn("__rn", row_number().over(wc)).where(col("__rn") <= nprobe)
      .select(col("query_id"), col("__qq"), col("__qn2"), col("__cell"))

    val cos = dot(col("__qq"), col("__cq")).cast("double") /
      (sqrt(col("__qn2").cast("double")) * sqrt(col("__cn2").cast("double")))
    // STATIC partition pruning on the cell-partitioned index: the broadcast
    // join alone plans dynamic pruning that degenerates to `true` under AQE
    // (observed: PartitionFilters [dynamicpruningexpression(true)] — a full
    // index scan). The probed-cell set is at most nlist ints, so collecting
    // it costs one tiny job and turns the probe into a real
    // partition-pruned read — the point of the IVF layout. Only worth it
    // when the index IS a cell-partitioned file relation (loadIndex); for
    // an in-memory just-built index there is nothing to prune and the
    // extra job would recompute the probe subplan for no benefit.
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val cellPartitioned = index.assigned.queryExecution.analyzed.collectFirst {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.partitionSchema.fieldNames.contains("__cell")
        case _ => false
      }
    }.getOrElse(false)
    val pruned =
      if (!cellPartitioned) index.assigned
      else {
        val probedCells = probes.select(col("__cell")).distinct()
          .collect().map(_.get(0)).toSeq
        index.assigned.where(col("__cell").isin(probedCells: _*))
      }
    val scored = pruned
      .join(broadcast(probes), Seq("__cell"))
      .where(col("nn_id") =!= col("query_id"))
      .select(col("query_id"), col("nn_id"), cos.as("cosine"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("nn_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "nn_id", "cosine")
  }

  /** IVF-Flat ANN, build + search in one call (the FAISS-style
    * inverted-file index as a DataFrame pipeline). Compared to [[lshTopK]],
    * the quantizer adapts to the data distribution, which is what recovers
    * recall on clustered production embeddings.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              embCol: String, k: Int, nlist: Int = 64, nprobe: Int = 8,
              seed: Long = 13): DataFrame =
    ivfSearch(ivfBuild(corpus, idCol, embCol, nlist, seed),
      queries, idCol, embCol, k, nprobe)

  /** A built product-quantization index: per corpus vector, `m` small
    * codes (one per subspace) replacing the full float vector in the scan
    * — the FAISS-PQ memory layout. At 100 TB the raw embeddings cannot
    * live in scan-hot storage: 64 floats (256 B) compress to `m` codes
    * (`m` bytes at 256 centroids), a 32x scan-size reduction; the exact
    * vectors stay cold and are read only for the final refine of a
    * shortlist. `codebooks(mi)(j)` is subspace `mi`'s centroid `j` over
    * L2-NORMALIZED vectors (PQ for cosine trains on the unit sphere, so
    * the ADC dot approximates cosine directly).
    */
  final case class PqIndex(codes: DataFrame, codebooks: Seq[Seq[Seq[Double]]],
                           subDim: Int) {
    /** Release the cached encoding ([[Similarity.pqBuild]] persists it so
      * repeated searches — and the two uses inside one search (compressed
      * scan + refine) — never re-encode the corpus). */
    def free(): Unit = codes.unpersist()
  }

  /** L2-normalized double embedding (zero vectors stay zero). */
  private def normalized(emb: Column): Column = {
    val d = transform(emb, x => x.cast("double"))
    val n2 = aggregate(d, lit(0.0), (a, x) => a + x * x)
    transform(d, x => x / sqrt(greatest(n2, lit(1e-30))))
  }

  /** Index of the strictly-smallest element (first wins on ties —
    * deterministic), as one codegen'd fold. */
  private def argminIdx(dists: Column): Column =
    aggregate(dists,
      struct(lit(Double.MaxValue).as("d"), lit(-1).as("j"), lit(0).as("i")),
      (acc, x) => struct(
        least(x, acc.getField("d")).as("d"),
        when(x < acc.getField("d"), acc.getField("i"))
          .otherwise(acc.getField("j")).as("j"),
        (acc.getField("i") + lit(1)).as("i")),
      acc => acc.getField("j"))

  /** Trains `m` per-subspace codebooks (MLlib KMeans on ONE shared
    * sample, seeded per subspace) and encodes every corpus vector to its
    * `m` nearest-centroid codes in a single map-side expression pass —
    * the corpus is never shuffled. Exact quantized vectors ride along in
    * the index frame for the refine stage ([[pqSearch]]); a production
    * layout splits them to cold storage keyed by id.
    */
  def pqBuild(corpus: DataFrame, idCol: String, embCol: String,
              m: Int = 8, codesPerSub: Int = 16, seed: Long = 13,
              maxTrainRows: Long = 65536, maxIter: Int = 8): PqIndex = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val base = corpus.select(col(idCol).as("nn_id"),
        quantize(col(embCol)).as("__cq"),
        normalized(col(embCol)).as("__en"))
      .withColumn("__cn2", norm2(col("__cq")))
    val dim = base.select(size(col("__en"))).head().getInt(0)
    require(dim % m == 0, s"embedding dim $dim must divide into $m subspaces")
    val subDim = dim / m

    val total = base.count()
    val train = (if (total <= maxTrainRows) base
      else base.sample(withReplacement = false,
        math.min(1.0, maxTrainRows.toDouble * 1.05 / total), seed))
      .select((0 until m).map(mi =>
        array_to_vector(slice(col("__en"), mi * subDim + 1, subDim)).as(s"__f$mi")): _*)
      .cache()
    // the m fits are independent tiny jobs dominated by per-job fixed
    // cost; submit them concurrently and let Spark's scheduler interleave
    // (sequential fits measured ~6s of pure overhead at m=8)
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    val codebooks =
      try Await.result(Future.sequence((0 until m).map { mi =>
        Future {
          new KMeans().setK(codesPerSub).setSeed(seed + mi).setMaxIter(maxIter)
            .setFeaturesCol(s"__f$mi").setPredictionCol("__c")
            .fit(train).clusterCenters.toSeq.map(_.toArray.toSeq)
        }
      }), Duration.Inf)
      finally train.unpersist()

    val codeCols = (0 until m).map { mi =>
      val sub = slice(col("__en"), mi * subDim + 1, subDim)
      argminIdx(transform(typedLit(codebooks(mi)), c =>
        aggregate(zip_with(sub, c, (x, y) => (x - y) * (x - y)),
          lit(0.0), (a, x) => a + x)))
    }
    // persist the artifact: one search already reads it twice (ADC scan +
    // refine join), and build-once/search-many is the index's contract —
    // without this every action re-runs normalize+encode over the corpus
    PqIndex(base.withColumn("__codes", array(codeCols: _*)).drop("__en")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK),
      codebooks, subDim)
  }

  /** Persist a PQ index: the coded corpus (codes + exact quantized
    * vectors for the refine stage; a production layout splits the exact
    * vectors to cold storage) plus the codebooks and subspace geometry.
    * Same build-once/search-many contract as [[saveIndex]] for IVF — the
    * KMeans training and corpus encoding are the expensive parts and
    * must not be re-paid per search session.
    */
  def savePqIndex(index: PqIndex, dir: String): Unit = {
    val spark = index.codes.sparkSession
    import spark.implicits._
    index.codes.write.mode("overwrite").parquet(s"$dir/codes")
    index.codebooks.zipWithIndex.flatMap { case (cb, mi) =>
      cb.zipWithIndex.map { case (cent, j) => (mi, j, cent) }
    }.toDF("mi", "j", "cent").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/codebooks")
    Seq(index.subDim).toDF("sub_dim").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/meta")
  }

  /** Load a PQ index saved by [[savePqIndex]]. The coded corpus is
    * re-persisted (one search reads it twice); `free()` releases it. */
  def loadPqIndex(spark: org.apache.spark.sql.SparkSession, dir: String): PqIndex = {
    val codebooks = spark.read.parquet(s"$dir/codebooks")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toIndexedSeq))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, rows) => rows.sortBy(_._2).map(_._3).toIndexedSeq }
    val subDim = spark.read.parquet(s"$dir/meta").collect()(0).getInt(0)
    PqIndex(spark.read.parquet(s"$dir/codes")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK),
      codebooks, subDim)
  }

  /** Two-stage PQ search: (1) asymmetric-distance scan — each query
    * precomputes its `m x codesPerSub` table of subspace dots (one tiny
    * broadcast row per query) and every corpus vector scores as `m` table
    * lookups over its CODES, never touching floats; (2) the per-query
    * top `k * shortlist` candidates refine with the exact quantized
    * cosine (a join back to the exact vectors by id — at scale the only
    * rows read from cold storage). Output matches the other top-k ops:
    * (query_id, rank, nn_id, cosine), exact-cosine ranked.
    */
  def pqSearch(index: PqIndex, queries: DataFrame, idCol: String,
               embCol: String, k: Int, shortlist: Int = 8): DataFrame = {
    val mSub = index.codebooks.length
    val qtabCols = (0 until mSub).map { mi =>
      val qsub = slice(col("__en"), mi * index.subDim + 1, index.subDim)
      transform(typedLit(index.codebooks(mi)), c =>
        aggregate(zip_with(qsub, c, (x, y) => x * y), lit(0.0), (a, x) => a + x))
    }
    val q = queries.select(col(idCol).as("query_id"),
        quantize(col(embCol)).as("__qq"),
        normalized(col(embCol)).as("__en"))
      .withColumn("__qn2", norm2(col("__qq")))
      .withColumn("__qtab", array(qtabCols: _*))
      .drop("__en")

    val approx = (0 until mSub).map { mi =>
      element_at(element_at(col("__qtab"), mi + 1),
        element_at(col("__codes"), mi + 1) + 1)
    }.reduce(_ + _)
    val shortlisted = index.codes.select("nn_id", "__codes")
      .crossJoin(broadcast(q.select(col("query_id"), col("__qtab"))))
      .where(col("nn_id") =!= col("query_id"))
      .select(col("query_id"), col("nn_id"), approx.as("__approx"))
    val ws = Window.partitionBy("query_id")
      .orderBy(col("__approx").desc, col("nn_id"))
    val cand = shortlisted.withColumn("__rn", row_number().over(ws))
      .where(col("__rn") <= k * shortlist).select("query_id", "nn_id")

    // refine: exact cosine over ONLY the shortlist rows
    val cos = dot(col("__qq"), col("__cq")).cast("double") /
      (sqrt(col("__qn2").cast("double")) * sqrt(col("__cn2").cast("double")))
    val exact = cand
      .join(index.codes.select(col("nn_id"), col("__cq"), col("__cn2")), "nn_id")
      .join(broadcast(q.select(col("query_id"), col("__qq"), col("__qn2"))), "query_id")
      .select(col("query_id"), col("nn_id"), cos.as("cosine"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("nn_id"))
    exact.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "nn_id", "cosine")
  }

  /** PQ build + search in one call. */
  def pqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
             embCol: String, k: Int, m: Int = 8, codesPerSub: Int = 16,
             shortlist: Int = 8, seed: Long = 13): DataFrame =
    pqSearch(pqBuild(corpus, idCol, embCol, m, codesPerSub, seed),
      queries, idCol, embCol, k, shortlist)

  /** Integer-quantized hyperplane bucket: bit i set iff dot(q, plane_i) >= 0. */
  private def bucketExpr(q: Column, planes: Seq[Seq[Long]]): Column =
    planes.zipWithIndex.map { case (w, i) =>
      when(dot(q, array(w.map(lit): _*)) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** ANN top-k via LSH with multi-probe: recall < 1 but each query scores
    * only matching buckets instead of the full corpus. The bucket is
    * computed once per row; probes explode from the stored value.
    *
    * `probeHamming` sets the probe radius: all buckets within that Hamming
    * distance of the query's bucket (1 -> planes+1 buckets, 2 -> adds all
    * two-bit flips). Measured on the sf0.001 embeddings table (isotropic
    * vectors, true neighbors near-orthogonal — the worst case for
    * hyperplane LSH): recall@5 ~ 0.11 at radius 1, ~ 0.3 at radius 2,
    * scanning ~4% / ~14% of the corpus respectively (OperatorsSpec
    * quantifies this). On clustered production embeddings the same knobs
    * land much higher; radius is the recall/cost dial.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              embCol: String, k: Int, planes: Int = 8, dim: Int = 64,
              probeHamming: Int = 1): DataFrame = {
    val hp = planeCoeffsAnn(planes, dim)
    val c = corpus.select(col(idCol).as("nn_id"), quantize(col(embCol)).as("__cq"))
      .withColumn("__cn2", norm2(col("__cq")))
      .withColumn("__bucket", bucketExpr(col("__cq"), hp))
    val masks: Seq[Long] = {
      val one = (0 until planes).map(i => 1L << i)
      val two =
        if (probeHamming >= 2)
          for (i <- 0 until planes; j <- i + 1 until planes) yield (1L << i) | (1L << j)
        else Seq.empty
      0L +: (one ++ two)
    }
    val q = queries.select(col(idCol).as("query_id"), quantize(col(embCol)).as("__qq"))
      .withColumn("__qn2", norm2(col("__qq")))
      .withColumn("__b0", bucketExpr(col("__qq"), hp))
      .withColumn("__bucket", explode(array(
        masks.map(m => col("__b0").bitwiseXOR(lit(m))): _*)))
      .drop("__b0")
    val cos = dot(col("__qq"), col("__cq")).cast("double") /
      (sqrt(col("__qn2").cast("double")) * sqrt(col("__cn2").cast("double")))
    val scored = c.join(broadcast(q), Seq("__bucket"))
      .where(col("nn_id") =!= col("query_id"))
      .select(col("query_id"), col("nn_id"), cos.as("cosine"))
      .dropDuplicates("query_id", "nn_id")
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("nn_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "nn_id", "cosine")
  }
}
