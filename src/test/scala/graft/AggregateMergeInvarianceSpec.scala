package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Distributed-correctness property for the typed-aggregate family: a
  * partial/final split across ANY partitioning must produce the same
  * result as a single partition — buffer merge has to be associative and
  * commutative, and output formatting independent of merge order. Random
  * seeded datasets with heavy ties (values 0..20, four categories) poke
  * exactly where tie-breaking or order-dependent merges would diverge.
  * Values are integers so no float-sum reordering noise masks a real
  * merge bug.
  */
class AggregateMergeInvarianceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(s)
    s
  }

  private val aggSql = """
    SELECT key,
           top(value, 3) AS t3,
           topn_frequency(cate, 2) AS tf,
           top1_ratio(cate) AS t1r,
           sum_where(value, cond) AS sw,
           count_where(value, cond) AS cw,
           min_where(value, cond) AS mnw,
           max_where(value, cond) AS mxw,
           sum_cate(value, cate) AS sc,
           avg_cate(value, cate) AS ac,
           count_cate(value, cate) AS cc,
           sum_cate_where(value, cond, cate) AS scw,
           top_n_key_sum_cate_where(value, cond, cate, 2) AS tnk,
           top_n_value_sum_cate_where(value, cond, cate, 2) AS tnv,
           top_n_key_ratio_cate(value, cond, cate, 2) AS tnkr,
           graft_median(value) AS md,
           distinct_count(cate) AS dc
    FROM t GROUP BY key ORDER BY key"""

  test("every aggregate is invariant to the partition split (4 seeded datasets)") {
    import spark.implicits._
    for (seed <- Seq(1, 7, 42, 1234)) {
      val rnd = new scala.util.Random(seed)
      val rows = Seq.fill(400)((
        s"k${rnd.nextInt(4)}",
        rnd.nextInt(21).toLong,          // heavy value ties
        s"c${rnd.nextInt(4)}",           // four categories
        rnd.nextBoolean()))
      val df = rows.toDF("key", "value", "cate", "cond")

      def run(parts: Int): Seq[String] = {
        df.repartition(parts).createOrReplaceTempView("t")
        spark.sql(aggSql).collect().map(_.toString).toSeq
      }
      val single = run(1)
      val split = run(11)
      assert(single == split,
        s"seed $seed: merge across 11 partitions diverged from single-partition\n" +
          single.zip(split).filter(p => p._1 != p._2).take(2).mkString("\n"))
    }
  }
}
