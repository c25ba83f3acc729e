package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Product-quantization pins on the real embeddings: shortlist recall vs
  * the exact baseline, code shape/compression, deterministic encoding,
  * and refine exactness (output cosines equal brute-force cosines).
  */
class PqSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"
  private def haveData = new java.io.File(dir).isDirectory

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("PQ recall@5 vs brute force >= 0.7 on isotropic sf0.001 embeddings") {
    assume(haveData)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val queries = emb.where("vec_id < 10")
    val bf = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val pq = Similarity.pqTopK(emb, queries, "vec_id", "embedding", 5,
        m = 8, codesPerSub = 16, shortlist = 16)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (pq & bf).size.toDouble / bf.size
    // measured 0.94 at these knobs (isotropic vectors — the hard case);
    // 0.7 floors seed/platform drift without masking a real regression
    assert(recall >= 0.7, f"recall@5 $recall%.3f < 0.7")
  }

  test("codes are m small ints (the 32x scan-compression shape), encoding deterministic") {
    assume(haveData)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val idx = Similarity.pqBuild(emb, "vec_id", "embedding", m = 8, codesPerSub = 16)
    val rows = idx.codes.select("nn_id", "__codes").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toVector).toMap
    assert(rows.size == emb.count())
    rows.values.foreach { cs =>
      assert(cs.length == 8 && cs.forall(c => c >= 0 && c < 16))
    }
    assert(idx.codebooks.length == 8 &&
      idx.codebooks.forall(cb => cb.length == 16 && cb.forall(_.length == idx.subDim)))
    val again = Similarity.pqBuild(emb, "vec_id", "embedding", m = 8, codesPerSub = 16)
      .codes.select("nn_id", "__codes").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toVector).toMap
    assert(again == rows, "same corpus + same seed must encode identically")
  }

  test("save/load roundtrip: searching a loaded index equals searching the built one") {
    assume(haveData)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val queries = emb.where("vec_id < 10")
    val built = Similarity.pqBuild(emb, "vec_id", "embedding", m = 8, codesPerSub = 16)
    val root = java.nio.file.Files.createTempDirectory("graft_pq_idx_").toString
    try {
      Similarity.savePqIndex(built, root)
      val loaded = Similarity.loadPqIndex(spark, root)
      try {
        assert(loaded.subDim == built.subDim)
        assert(loaded.codebooks == built.codebooks, "codebooks must roundtrip exactly")
        val a = Similarity.pqSearch(built, queries, "vec_id", "embedding", 5)
          .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
        val b = Similarity.pqSearch(loaded, queries, "vec_id", "embedding", 5)
          .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
        assert(a == b, "loaded-index search diverged from built-index search")
      } finally loaded.free()
    } finally built.free()
  }

  test("refine stage is exact: PQ output cosines equal brute-force cosines pairwise") {
    assume(haveData)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val queries = emb.where("vec_id < 5")
    val bf = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 20)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val pq = Similarity.pqTopK(emb, queries, "vec_id", "embedding", 5,
        m = 8, codesPerSub = 16, shortlist = 16)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3))
    pq.foreach { case (key, cosine) =>
      bf.get(key).foreach { exact =>
        assert(cosine == exact, s"$key: refined cosine $cosine != exact $exact")
      }
    }
  }
}
