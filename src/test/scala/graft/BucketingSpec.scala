package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed co-located join — the planned-layout answer to the shuffle
  * that dominates repeated big-big joins at 100 TB: both sides written
  * `bucketBy(N, key)` hash-place their rows identically, so a later join
  * on the key needs NO Exchange on either side (the standard warehouse
  * layout for fact-dim and fact-fact joins that run every day). This pin
  * proves the whole contract end to end: same-bucketed join plans with
  * zero shuffles, a non-bucketed copy of the same data plans two, and
  * results match.
  */
class BucketingSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        Files.createTempDirectory("graft_bucketing").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("join on the bucket key plans with no Exchange; results equal the shuffled join") {
    import spark.implicits._
    // AQE off for the pin: the executed plan stays directly inspectable
    // (no AdaptiveSparkPlanExec/QueryStageExec wrapping). Runtime conf,
    // saved/restored, so suite order can't leak it — the warehouse dir
    // above only applies when this suite creates the session; table names
    // are suite-unique either way and dropped at the end.
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val abtWas = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    val aabtWas = spark.conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val facts = (0 until 20000).map(i => (i.toLong % 500, i.toLong, (i % 97).toDouble))
      .toDF("user_id", "event_seq", "amount")
    val dim = (0 until 500).map(k => (k.toLong, s"segment_${k % 7}"))
      .toDF("user_id", "segment")

    facts.write.mode("overwrite").bucketBy(8, "user_id")
      .sortBy("user_id").saveAsTable("b_facts")
    dim.write.mode("overwrite").bucketBy(8, "user_id")
      .sortBy("user_id").saveAsTable("b_dim")
    facts.write.mode("overwrite").saveAsTable("p_facts")
    dim.write.mode("overwrite").saveAsTable("p_dim")

    // disable AQE broadcast conversion so both variants keep the
    // sort-merge shape and the Exchange count isolates the bucketing
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val bucketed = spark.sql(
        """SELECT f.user_id, count(*) AS n, sum(f.amount) AS amt, max(d.segment) AS seg
           FROM b_facts f JOIN b_dim d ON f.user_id = d.user_id
           GROUP BY f.user_id""")
      val plain = spark.sql(
        """SELECT f.user_id, count(*) AS n, sum(f.amount) AS amt, max(d.segment) AS seg
           FROM p_facts f JOIN p_dim d ON f.user_id = d.user_id
           GROUP BY f.user_id""")

      def joinExchanges(df: org.apache.spark.sql.DataFrame): Int = {
        // count Exchanges BELOW the join (feeding it): walk the executed
        // plan, find the SMJ, count exchange nodes in its subtree
        val plan = df.queryExecution.executedPlan
        val smj = plan.collectFirst {
          case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
        }
        assert(smj.isDefined, s"expected a sort-merge join:\n$plan")
        smj.get.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
        }.length
      }

      assert(joinExchanges(bucketed) == 0,
        "bucketed join must not shuffle either side")
      assert(joinExchanges(plain) == 2,
        "the non-bucketed control should shuffle both sides")
      // and the layout must not change answers
      val a = bucketed.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted
      val b = plain.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted
      assert(a.toSeq == b.toSeq)
      // the post-join aggregate on the same key also rides the bucketing:
      // no exchange anywhere in the bucketed plan
      val totalEx = bucketed.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }.length
      assert(totalEx == 0, "group-by on the bucket key must reuse the layout")
    } finally {
      // restore EVERY conf this test touched to its pre-test value — a
      // shared getOrCreate session must leave no trace for later suites
      spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
      abtWas.fold(spark.conf.unset("spark.sql.autoBroadcastJoinThreshold"))(
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", _))
      aabtWas.fold(spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold"))(
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", _))
      Seq("b_facts", "b_dim", "p_facts", "p_dim")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }
}
