package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

/** Salted skew-join pins: result parity with the plain join on heavily
  * skewed data, the hot key actually spreading over several salt
  * buckets, and the shuffle keyed by (key, salt).
  */
class SkewSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  // 10k rows, HALF on one hot key — the shape that straggles a plain join
  private def skewed = {
    import spark.implicits._
    (0 until 10000).map { i =>
      (if (i % 2 == 0) 7L else (i % 100).toLong, i.toLong, s"p$i")
    }.toDF("k", "seq", "payload")
  }

  private def dim = {
    import spark.implicits._
    (0 until 100).map(k => (k.toLong, s"d$k")).toDF("k", "attr")
  }

  test("salted inner join is row-identical to the plain join under 50% key skew") {
    val plain = skewed.join(dim, Seq("k")).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted
    val salted = Skew.saltedJoin(skewed, dim, "k", salts = 8).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted
    assert(salted.length == 10000)
    assert(salted.toSeq == plain.toSeq)
  }

  test("salted left join keeps unmatched rows exactly once") {
    import spark.implicits._
    val dimMissingHot = dim.where("k <> 7")
    val plain = skewed.join(dimMissingHot, Seq("k"), "left").collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted
    val salted = Skew.saltedJoin(skewed, dimMissingHot, "k", 8, "left").collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted
    assert(salted.toSeq == plain.toSeq)
    // every k=7 row survives null-padded, once each: 5000 from the even
    // branch + 100 from the odd branch (i % 100 == 7)
    assert(salted.count(_.endsWith("|null")) == 5100)
  }

  test("the hot key spreads across salt buckets; the shuffle keys on (key, salt)") {
    val df = skewed
    val salts = df.where("k = 7").select(Skew.rowSalt(df, 8).as("s"))
      .distinct().collect().map(_.getInt(0)).toSet
    assert(salts.size >= 4, s"hot key landed on only ${salts.size} of 8 salts")
    assert(salts.forall(s => s >= 0 && s < 8))

    val plan = Skew.saltedJoin(skewed, dim, "k", 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("__graft_salt"),
      "join shuffle must partition on the salt column")
  }

  test("salt is deterministic: same rows, same salts, every evaluation") {
    val df = skewed
    val a = df.select(Skew.rowSalt(df, 8).as("s")).collect().map(_.getInt(0)).toSeq
    val b = df.select(Skew.rowSalt(df, 8).as("s")).collect().map(_.getInt(0)).toSeq
    assert(a == b)
  }
}
