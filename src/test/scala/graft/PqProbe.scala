package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Dev probe (not an invariant pin): measures PQ shortlist recall on the
  * real embeddings so the spec's floors are set from data. Tagged by
  * name; prints, asserts nothing beyond shape.
  */
class PqProbe extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private def haveData = new java.io.File(dir).isDirectory

  test("probe: PQ recall@5 on sf0.001 embeddings", org.scalatest.Tag("probe")) {
    assume(haveData && sys.env.contains("GRAFT_PROBE"))
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val queries = emb.where("vec_id < 10")
    val bf = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    for (m <- Seq(8, 16); cps <- Seq(16, 32); sl <- Seq(8, 16)) {
      val t0 = System.nanoTime()
      val pq = Similarity.pqTopK(emb, queries, "vec_id", "embedding", 5,
        m = m, codesPerSub = cps, shortlist = sl)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      val rec = (pq & bf).size.toDouble / bf.size
      println(f"PQ m=$m cps=$cps sl=$sl recall@5=$rec%.3f t=${(System.nanoTime()-t0)/1e9}%.1fs")
    }
  }
}
