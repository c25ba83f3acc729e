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

  /** Independent brute-force oracle in plain Scala: grams via
    * String.sliding(3) and explicit code-point packing — shares NO code
    * with FuzzyJoin.grams3, so gram-construction bugs can't self-verify.
    */
  private def brute(l: org.apache.spark.sql.DataFrame, lid: String, ln: String,
                    r: org.apache.spark.sql.DataFrame, rid: String, rn: String,
                    num: Int, den: Int): Set[(Long, Long, Long, Long)] = {
    def grams(s: String): Set[Long] =
      if (s.length < 3) Set.empty
      else s.sliding(3).map { g =>
        (g.charAt(0).toLong << 42) | (g.charAt(1).toLong << 21) | g.charAt(2).toLong
      }.toSet
    val ls = l.select(lid, ln).collect().map(x => (x.getLong(0), grams(x.getString(1))))
    val rs = r.select(rid, rn).collect().map(x => (x.getLong(0), grams(x.getString(1))))
    (for {
      (li, lg) <- ls; (ri, rg) <- rs
      if lg.nonEmpty && rg.nonEmpty
      inter = (lg & rg).size.toLong
      uni = lg.size + rg.size - inter
      if inter * den >= uni * num
    } yield (li, ri, inter, uni)).toSet
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
    // 4/40 and 30 are sub-3-char names: zero grams, silently dropped on
    // both sides (a naive sequence(1, len-2) would fabricate phantom
    // grams from descending indices and match them to each other)
    val l = Seq((1L, "abcdef#0000"), (2L, "ghijkl#0000"), (3L, "abcdxy#0000"),
      (4L, "ab"), (30L, "")).toDF("lid", "lname")
    val r = Seq((10L, "abcdef#0000"), (20L, "zzzzzz#0000"), (40L, "ab"))
      .toDF("rid", "rname")
    val got = FuzzyJoin.jaccardJoin(l, "lid", "lname", r, "rid", "rname",
        num = 1, den = 2)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val expect = brute(l, "lid", "lname", r, "rid", "rname", 1, 2)
      .map(t => (t._1, t._2))
    assert(got == expect)
    assert(got.contains((1L, 10L))) // the exact duplicate pair must match
  }

  test("fallback classes (k < 2 tiny sets, oversized prefixes) stay lossless") {
    import spark.implicits._
    // tiny: "abcd" has 2 grams -> k = ceil(2/3) = 1 < 2, so a true match
    // may share only ONE gram and the pair path would lose it — these
    // records must ride the single-gram fallback. "abc"/"abcd": J = 1/2.
    // oversized: >64-gram extended prefixes (k >= 2 but the C(p,2)
    // expansion is capped) — built from distinct-trigram alphabets with
    // a one-char edit, J well above 1/3; their partners must survive
    // the static partner-class pruning (n >= minOversizedN * num / den).
    val alpha = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    val longA = (0 until 60).map(i => alpha(i % alpha.length)).mkString +
      (0 until 60).map(i => alpha((i * 7 + 3) % alpha.length)).mkString
    val longB = longA.updated(57, '#') // one edit: J stays >> 1/3
    val l = Seq((1L, "abc"), (2L, "xyz"), (3L, longA)).toDF("lid", "lname")
    val r = Seq((10L, "abcd"), (20L, "xyzw"), (30L, longB), (40L, longA))
      .toDF("rid", "rname")
    val got = FuzzyJoin.jaccardJoin(l, "lid", "lname", r, "rid", "rname",
        num = 1, den = 3)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val expect = brute(l, "lid", "lname", r, "rid", "rname", 1, 3)
      .map(t => (t._1, t._2))
    assert(expect.contains((1L, 10L)), "tiny-set true match must exist in oracle")
    assert(expect.contains((3L, 30L)), "oversized true match must exist in oracle")
    assert(got == expect,
      s"missing=${(expect -- got).take(3)} extra=${(got -- expect).take(3)}")
  }

  test("every ladder width (1, 2, 3) == brute force on sf0.001 customer x supplier") {
    // the ladder's rungs must be interchangeable: same exact output at
    // any blocking-key width, auto included (VERDICT r12 #4 — the Δ=2
    // triple-key path needs the same brute-force equality as Δ=0/1)
    val dir = new java.io.File("/root/testdata/sf0.001")
    assume(dir.exists())
    val c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    val s = spark.read.parquet("/root/testdata/sf0.001/supplier.parquet")
    val expect = brute(c, "c_custkey", "c_name", s, "s_suppkey", "s_name", 7, 25)
    assert(expect.nonEmpty)
    (0 to 3).foreach { w =>
      val got = FuzzyJoin.jaccardJoin(c, "c_custkey", "c_name",
          s, "s_suppkey", "s_name", num = 7, den = 25, blockWidth = w)
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3))).toSet
      assert(got == expect, s"width $w: missing=${(expect -- got).take(3)} " +
        s"extra=${(got -- expect).take(3)}")
    }
  }

  test("width 3 with mixed classes (tiny k<3 sets, oversized prefixes) stays lossless") {
    import spark.implicits._
    // tiny: "abcd"/"abcde" have k = 1..2 < 3 — true matches may share
    // fewer than 3 grams, so these must ride the all-grams fallback;
    // oversized: >24-gram extended prefixes under width 3 fall back too
    val alpha = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    val longA = (0 until 60).map(i => alpha(i % alpha.length)).mkString +
      (0 until 60).map(i => alpha((i * 7 + 3) % alpha.length)).mkString
    val longB = longA.updated(57, '#')
    val l = Seq((1L, "abc"), (2L, "abcdef"), (3L, longA)).toDF("lid", "lname")
    val r = Seq((10L, "abcd"), (20L, "abcdex"), (30L, longB), (40L, longA))
      .toDF("rid", "rname")
    val got = FuzzyJoin.jaccardJoin(l, "lid", "lname", r, "rid", "rname",
        num = 1, den = 3, blockWidth = 3)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val expect = brute(l, "lid", "lname", r, "rid", "rname", 1, 3)
      .map(t => (t._1, t._2))
    assert(expect.contains((1L, 10L)), "tiny-set true match must exist in oracle")
    assert(expect.contains((3L, 30L)), "oversized true match must exist in oracle")
    assert(got == expect,
      s"missing=${(expect -- got).take(3)} extra=${(got -- expect).take(3)}")
  }

  test("threshold 1.0 (num == den) terminates and finds exact duplicates only") {
    // ADVICE r12: at t = 1 the oversized-prefix search predicate
    // n - n + 2 > 64 is constantly false — the driver used to spin
    // forever deriving minOversizedN. The degenerate threshold must
    // degrade the bound to "never" and still return the exact result.
    import spark.implicits._
    val l = Seq((1L, "abcdef"), (2L, "ghijkl"), (3L, "abcdef")).toDF("lid", "lname")
    val r = Seq((10L, "abcdef"), (20L, "abcdex")).toDF("rid", "rname")
    val got = FuzzyJoin.jaccardJoin(l, "lid", "lname", r, "rid", "rname",
        num = 1, den = 1)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val expect = brute(l, "lid", "lname", r, "rid", "rname", 1, 1)
      .map(t => (t._1, t._2))
    assert(expect == Set((1L, 10L), (3L, 10L)))
    assert(got == expect)
  }
}
