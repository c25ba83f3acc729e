package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** 10x scaling probe for the curation family (chunk / repetition /
  * winnow / pack / decontaminate): synthetic corpora at sf0.1 scale
  * (5k docs) and 10x (50k docs), same shape as the driver testdata
  * (~40-80 word-tokens per doc, 20 sources). Run with
  * `Test/runMain graft.CurationProbe`; numbers recorded in README scale
  * notes. Other tables symlink to sf0.001 so GraftSession.prepare's
  * whole-directory contract holds.
  */
object CurationProbe {

  private val QUERIES =
    Seq("q_chunk", "q_repetition", "q_winnow", "q_pack", "q_decontaminate")

  private def corpus(spark: SparkSession, n: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    // deterministic word soup: doc length 40 + (id % 41), word index a
    // fixed LCG of (id, j) over a 2000-word vocab — same shape every run
    val vocab = array((0 until 2000).map(i => lit(s"w$i")): _*)
    spark.range(n.toLong).select(
      col("id").as("doc_id"),
      concat_ws(" ", transform(
        sequence(lit(1), (lit(40) + pmod(col("id"), lit(41))).cast("int")),
        j => element_at(vocab,
          (pmod(col("id") * 7919 + j.cast("long") * 104729, lit(2000)) + 1).cast("int"))))
        .as("text"),
      lit("en").as("lang"),
      concat(lit("src"), pmod(col("id"), lit(20))).as("source"))
      .withColumn("n_chars", length(col("text")))
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfSmall = "/root/testdata/sf0.001"
    for (n <- Seq(5000, 50000)) {
      val dir = Files.createTempDirectory(s"graft_curation_${n}_").toString
      GraftSession.tables.filter(_ != "documents").foreach { t =>
        Files.createSymbolicLink(
          Paths.get(s"$dir/$t.parquet"), Paths.get(s"$sfSmall/$t.parquet"))
      }
      corpus(spark, n).coalesce(8).write.parquet(s"$dir/documents.parquet")
      QUERIES.foreach { q =>
        val t0 = System.nanoTime()
        val rows = SparkEntry.queries(q)(spark, dir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"PROBE n=$n $q%-16s $sec%6.2f s  ($rows rows)")
      }
    }
    spark.stop()
  }
}
