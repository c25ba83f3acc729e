package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.FuzzyJoin

/** Prefix-filtered set-similarity join pins: lossless equality with the
  * brute-force cross join (the PPJoin prefix-filter theorem in practice)
  * on real testdata and on a planted case with stop-grams shared by
  * every record.
  */
class FuzzyJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def brute(l: org.apache.spark.sql.DataFrame, lid: String, ln: String,
                    r: org.apache.spark.sql.DataFrame, rid: String, rn: String,
                    num: Int, den: Int): Set[(Long, Long, Long, Long)] = {
    def g(c: org.apache.spark.sql.Column) =
      array_distinct(transform(sequence(lit(1), length(c) - 2),
        i => ascii(substring(c, i, lit(1))) * 65536 +
             ascii(substring(c, i + lit(1), lit(1))) * 256 +
             ascii(substring(c, i + lit(2), lit(1)))))
    val lc = l.select(col(lid).as("lid"), g(col(ln)).as("lg"))
    val rc = r.select(col(rid).as("rid"), g(col(rn)).as("rg"))
    lc.crossJoin(rc)
      .withColumn("inter", size(array_intersect(col("lg"), col("rg"))).cast("long"))
      .withColumn("uni", (size(col("lg")) + size(col("rg"))).cast("long") - col("inter"))
      .where(col("inter") * den >= col("uni") * num)
      .select("lid", "rid", "inter", "uni")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3))).toSet
  }

  test("prefix-filtered join == brute force on sf0.001 customer x supplier") {
    val dir = new java.io.File("/root/testdata/sf0.001")
    assume(dir.exists())
    val c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    val s = spark.read.parquet("/root/testdata/sf0.001/supplier.parquet")
    // sf0.001's small name universe tops out at J=0.294; 7/25 (0.28)
    // exercises the same machinery with real matches
    val got = FuzzyJoin.jaccardJoin(c, "c_custkey", "c_name",
        s, "s_suppkey", "s_name", num = 7, den = 25)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3))).toSet
    val expect = brute(c, "c_custkey", "c_name", s, "s_suppkey", "s_name", 7, 25)
    assert(expect.nonEmpty, "fixture must produce matches")
    assert(got == expect,
      s"missing=${(expect -- got).take(3)} extra=${(got -- expect).take(3)}")
  }

  test("stop-grams shared by every record stay out of prefixes; matches still exact") {
    import spark.implicits._
    // every name shares the '#0000' stop-tail; only the letter heads
    // discriminate. J(abcdef#0000, abcdxy#0000) etc.
    val l = Seq((1L, "abcdef#0000"), (2L, "ghijkl#0000"), (3L, "abcdxy#0000"))
      .toDF("lid", "lname")
    val r = Seq((10L, "abcdef#0000"), (20L, "zzzzzz#0000")).toDF("rid", "rname")
    val got = FuzzyJoin.jaccardJoin(l, "lid", "lname", r, "rid", "rname",
        num = 1, den = 2)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val expect = brute(l, "lid", "lname", r, "rid", "rname", 1, 2)
      .map(t => (t._1, t._2))
    assert(got == expect)
    assert(got.contains((1L, 10L))) // the exact duplicate pair must match
  }
}
