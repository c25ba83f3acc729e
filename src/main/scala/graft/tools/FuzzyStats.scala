package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.FuzzyJoin

/** Prints [[FuzzyJoin.chooseWidth]]'s statistics for the customer x
  * supplier fuzzy join of a testdata dir — the calibration instrument
  * for the ladder's fan-out bounds (run against sf0.1 and the ScaleUp'd
  * 10x/100x dirs, compare with the measured wall times per width).
  *
  * Usage: runMain graft.tools.FuzzyStats <sfDir> [num den]
  */
object FuzzyStats {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val num = if (args.length > 1) args(1).toInt else 1
    val den = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val c = GraftSession.table(spark, sfDir, "customer")
    val s = GraftSession.table(spark, sfDir, "supplier")
    val l = c.select(col("c_custkey").as("__lid"),
      FuzzyJoin.grams3(col("c_name")).as("__lg")).where(size(col("__lg")) > 0)
    val r = s.select(col("s_suppkey").as("__rid"),
      FuzzyJoin.grams3(col("s_name")).as("__rg")).where(size(col("__rg")) > 0)
    val st = FuzzyJoin.chooseWidth(l, r, num, den)
    val per = (st.nl + st.nr).max(1L).toDouble
    println(f"[fuzzy-stats] dir=$sfDir width=${st.width} vocab=${st.vocab} " +
      f"nl=${st.nl} nr=${st.nr} f1=${st.f1}%.0f f2=${st.f2}%.0f " +
      f"f1_per_rec=${st.f1 / per}%.1f f2_per_rec=${st.f2 / per}%.1f")
    spark.stop()
  }
}
