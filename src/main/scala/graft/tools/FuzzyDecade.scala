package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.FuzzyJoin

/** The fuzzy-join ladder's third-decade demonstration (VERDICT r12
  * next-round #4): the r12 sf10 decade profile (2.9x, then 12.9x) showed
  * the PAIR key space saturating in the decade after 100x. This tool
  * synthesizes that regime directly — names over the DIGIT alphabet
  * only, so the trigram vocabulary is <= 1000 and the pair-key space
  * (<= ~500k) saturates at corpus sizes a local run can hold — and
  * times the width-2 vs width-3 blocking plans at n and 10n, reporting
  * each width's decade slope and what the auto-selector picks.
  *
  * Names are seeded deterministically from the row id (md5-derived
  * digit strings, ~1% planted near-dup twins so the verify stage has
  * real output); both sides are independent populations the way
  * ScaleUp's corpora are. Correctness is NOT re-proven here — the
  * FuzzyJoinSpec brute-force equality pins every width on fixtures;
  * this tool measures the cost curve.
  *
  * Usage: runMain graft.tools.FuzzyDecade <outJson> [n=30000] [widths=2,3]
  * An empty widths list ("") runs the STATS PASS ONLY — seconds instead
  * of the ~40-minute w2@300k leg — re-emitting what the auto-selector
  * picks under the SHIPPED bounds (the r13 artifact's auto_width fields
  * were generated mid-calibration and contradicted the final bounds).
  */
object FuzzyDecade {

  private def corpus(spark: SparkSession, n: Long, salt: Int): DataFrame = {
    // ~18 decimal digits per name -> ~16 digit trigrams; ~1% of rows are
    // a one-char twin of their neighbor (id-1) so true matches exist
    spark.range(n)
      .withColumn("name",
        expr(s"cast(conv(substring(md5(cast(id + $salt as string)), 1, 14), 16, 10) as string)"))
      .withColumn("name",
        expr("""CASE WHEN id % 100 = 1
                THEN concat(cast(conv(substring(md5(cast(id - 1 + """ + salt +
          """ as string)), 1, 14), 16, 10) as string), '7')
                ELSE name END"""))
  }

  def main(args: Array[String]): Unit = {
    val outJson = args(0)
    val n = if (args.length > 1) args(1).toLong else 30000L
    val widths = (if (args.length > 2) args(2) else "2,3").split(",")
      .map(_.trim).filter(_.nonEmpty).map(_.toInt)

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .appName("graft-fuzzy-decade")
      .config("spark.sql.shuffle.partitions", "32")
      // the GraftSession broadcast policy: never broadcast from STATIC
      // estimates (a range-derived corpus is estimated at bytes and the
      // 90M-row triple-key side then dies building a 10 GiB broadcast);
      // AQE may still convert from MEASURED post-shuffle sizes
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "8388608")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val sb = new StringBuilder("{")
    sb.append(s""""n":$n,"scales":{""")
    val scales = Seq(n, n * 10)
    scales.zipWithIndex.foreach { case (rows, si) =>
      val l = corpus(spark, rows, salt = 0)
      val r = corpus(spark, rows, salt = 1000000007)
      // the auto-selector's reading of this corpus (stats pass only)
      val lw = l.select(col("id").as("__lid"),
        FuzzyJoin.grams3(col("name")).as("__lg")).where(size(col("__lg")) > 0)
      val rw = r.select(col("id").as("__rid"),
        FuzzyJoin.grams3(col("name")).as("__rg")).where(size(col("__rg")) > 0)
      val stats = FuzzyJoin.chooseWidth(lw, rw, 1, 3)
      val head = Seq(
        s""""auto_width":${stats.width}""",
        s""""vocab":${stats.vocab}""",
        f""""f1_per_record":${stats.f1 / (stats.nl + stats.nr)}%.1f""",
        f""""f2_per_record":${stats.f2 / (stats.nl + stats.nr)}%.1f""")
      val perWidth = widths.map { w =>
        val t0 = System.nanoTime()
        val out = FuzzyJoin.jaccardJoin(l, "id", "name", r, "id", "name",
          num = 1, den = 3, blockWidth = w)
        val matches = out.count()
        val sec = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[fuzzy-decade] rows=$rows width=$w sec=$sec%.1f matches=$matches")
        f""""w$w":{"sec":$sec%.2f,"matches":$matches}"""
      }
      sb.append(s""""${rows}":{${(head ++ perWidth).mkString(",")}}""")
      if (si == 0) sb.append(",")
    }
    sb.append("}}")
    Files.write(Paths.get(outJson), sb.toString.getBytes("UTF-8"))
    println(sb.toString)
    spark.stop()
  }
}
