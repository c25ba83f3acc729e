package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TemporalJoins

/** As-of / interval join semantics checked against naive cross-join
  * references, plus the plan-shape guarantees the operators exist for
  * (no nested-loop joins, no extra shuffles).
  */
class TemporalJoinsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  // left facts: (key, lts, fact_id); right dim rows: (key, rts, ver)
  private def leftDf = {
    import spark.implicits._
    Seq(
      ("a", 100L, 1L), ("a", 200L, 2L), ("a", 300L, 3L),
      ("b", 150L, 4L), ("b", 50L, 5L),
      ("c", 999L, 6L) // key with no right rows at all
    ).toDF("k", "lts", "fact_id")
  }

  private def rightDf = {
    import spark.implicits._
    Seq(
      ("a", 100L, 10L), ("a", 100L, 11L), // tie on (key, ts): larger payload wins
      ("a", 250L, 12L),
      ("b", 60L, 20L), ("b", 160L, 21L)
    ).toDF("k", "rts", "ver")
  }

  private def asofRows(df: DataFrame): Map[Long, (Option[Long], Option[Long])] =
    df.collect().map { r =>
      def opt(i: Int): Option[Long] = if (r.isNullAt(i)) None else Some(r.getLong(i))
      r.getAs[Long]("fact_id") ->
        (opt(r.fieldIndex("r_rts")), opt(r.fieldIndex("r_ver")))
    }.toMap

  test("asof backward: latest right at-or-before, ties to largest payload, LEFT semantics") {
    val out = TemporalJoins.asofJoin(leftDf, rightDf, Seq("k"), "lts", "rts", Seq("ver"))
    val m = asofRows(out)
    assert(m(1L) == (Some(100L), Some(11L))) // exact match included; tie -> ver 11
    assert(m(2L) == (Some(100L), Some(11L)))
    assert(m(3L) == (Some(250L), Some(12L)))
    assert(m(4L) == (Some(60L), Some(20L))) // 160 is after 150
    assert(m(5L) == (None, None))           // nothing at-or-before 50
    assert(m(6L) == (None, None))           // key never seen on the right
    assert(out.count() == 6)                // every left row survives
  }

  test("asof strict inequality excludes the equal-timestamp right row") {
    val m = asofRows(TemporalJoins.asofJoin(
      leftDf, rightDf, Seq("k"), "lts", "rts", Seq("ver"), allowExactMatch = false))
    assert(m(1L) == (None, None))           // rts=100 no longer visible to lts=100
    assert(m(2L) == (Some(100L), Some(11L)))
  }

  test("asof tolerance nulls matches farther than the bound, keeps the row") {
    val m = asofRows(TemporalJoins.asofJoin(
      leftDf, rightDf, Seq("k"), "lts", "rts", Seq("ver"), toleranceMs = Some(60L)))
    assert(m(1L) == (Some(100L), Some(11L))) // gap 0
    assert(m(2L) == (None, None))            // gap 100 > 60
    assert(m(3L) == (Some(250L), Some(12L))) // gap 50
    assert(m(4L) == (None, None))            // gap 90 > 60
  }

  test("asof forward: earliest right at-or-after") {
    val m = asofRows(TemporalJoins.asofJoin(
      leftDf, rightDf, Seq("k"), "lts", "rts", Seq("ver"), direction = "forward"))
    assert(m(1L) == (Some(100L), Some(11L)))
    assert(m(2L) == (Some(250L), Some(12L)))
    assert(m(3L) == (None, None))            // nothing at-or-after 300
    assert(m(5L) == (Some(60L), Some(20L)))
  }

  test("asof matches the naive per-row maximum on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val l = (1 to 300).map(i => (s"k${rnd.nextInt(5)}", rnd.nextInt(1000).toLong, i.toLong))
      .toDF("k", "lts", "fact_id")
    val r = (1 to 200).map(i => (s"k${rnd.nextInt(6)}", rnd.nextInt(1000).toLong, i.toLong))
      .toDF("k", "rts", "ver")
    val got = asofRows(TemporalJoins.asofJoin(l, r, Seq("k"), "lts", "rts", Seq("ver")))
    // naive reference: per left row, the max (rts, ver) among eligible rows
    val rRows = r.collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
    l.collect().foreach { x =>
      val (k, lts, fid) = (x.getString(0), x.getLong(1), x.getLong(2))
      val want = rRows.filter(t => t._1 == k && t._2 <= lts)
        .sortBy(t => (t._2, t._3)).lastOption
      assert(got(fid) == (want.map(_._2), want.map(_._3)), s"fact $fid")
    }
  }

  test("asof plan: union + one window, no join node") {
    val out = TemporalJoins.asofJoin(leftDf, rightDf, Seq("k"), "lts", "rts", Seq("ver"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"asof must not plan a join:\n$plan")
    assert(plan.contains("Window"), "asof runs as a window pass")
  }

  test("range join equals the naive cross-join filter and emits each pair once") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    // timestamps a multiple of the bucket width included -> boundary pairs
    val l = (1 to 200).map(i => (s"k${rnd.nextInt(4)}", (rnd.nextInt(20) * 50).toLong, i.toLong))
      .toDF("k", "lts", "fact_id")
    val r = (1 to 200).map(i => (s"k${rnd.nextInt(4)}", (rnd.nextInt(20) * 50).toLong, i.toLong))
      .toDF("k", "rts", "ver")
    val (lower, upper) = (-100L, 50L)
    val got = TemporalJoins.rangeJoin(l, r, Seq("k"), "lts", "rts", lower, upper, Seq("ver"))
      .select("fact_id", "r_ver").collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    val want = l.as("l").crossJoin(r.as("r"))
      .where($"l.k" === $"r.k" && $"rts".between($"lts" + lower, $"lts" + upper))
      .select($"fact_id", $"ver").collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    assert(got.sorted == want.sorted)
    assert(got.size == got.distinct.size, "no pair may be emitted twice")
    // a finer explicit bucket width must not change the result
    val fine = TemporalJoins.rangeJoin(l, r, Seq("k"), "lts", "rts", lower, upper,
      Seq("ver"), bucketMs = 40L)
      .select("fact_id", "r_ver").collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    assert(fine.sorted == want.sorted)
  }

  test("range join plans an equi-join, never a nested loop") {
    val out = TemporalJoins.rangeJoin(leftDf, rightDf, Seq("k"), "lts", "rts",
      -100L, 0L, Seq("ver"))
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join degenerated to a nested loop:\n$plan")
  }
}
