package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Components are quantized to integers (round(x*10000)) before any
  * arithmetic so dot products/norms are exact and rankings deterministic
  * and engine-reproducible; cosine = exact_dot / (sqrt(n1) * sqrt(n2)).
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

  private def quantize(emb: Column): Column =
    transform(emb, x => round(x.cast("double") * 10000).cast("long"))

  private def norm2(q: Column): Column =
    aggregate(q, lit(0L), (acc, x) => acc + x * x)

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

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

  /** Random-hyperplane LSH buckets (fixed seed), shared by index and probe. */
  private def bucketExpr(q: Column, planes: Int, dim: Int): Column = {
    val rnd = new scala.util.Random(11)
    val hp: Seq[Seq[Double]] = Seq.fill(planes)(Seq.fill(dim)(rnd.nextDouble() * 2 - 1))
    hp.zipWithIndex.map { case (plane, i) =>
      val d = aggregate(zip_with(q, array(plane.map(lit): _*), (a, b) => a.cast("double") * b),
        lit(0.0), (acc, x) => acc + x)
      when(d >= 0, shiftleft(lit(1L), i)).otherwise(0L)
    }.reduce(_ + _)
  }

  /** ANN top-k via LSH with single-bit multi-probe: recall < 1 but each
    * query scores only matching buckets instead of the full corpus.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              embCol: String, k: Int, planes: Int = 8, dim: Int = 64): DataFrame = {
    val c = corpus.select(col(idCol).as("nn_id"), quantize(col(embCol)).as("__cq"))
      .withColumn("__cn2", norm2(col("__cq")))
      .withColumn("__bucket", bucketExpr(col("__cq"), planes, dim))
    val probes = explode(array((0 until planes).map(i =>
      bucketExpr(col("__qq"), planes, dim).bitwiseXOR(shiftleft(lit(1L), i))) :+
      bucketExpr(col("__qq"), planes, dim): _*))
    val q = queries.select(col(idCol).as("query_id"), quantize(col(embCol)).as("__qq"))
      .withColumn("__qn2", norm2(col("__qq")))
      .withColumn("__bucket", probes)
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
