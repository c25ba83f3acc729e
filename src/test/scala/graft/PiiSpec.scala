package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Pii

class PiiSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("masks emails, IPv4s and phones; counts match; clean text untouched") {
    import spark.implicits._
    val df = Seq(
      (1L, "mail a.b+c@d-e.org and x@y.io, host 192.168.0.1, call +1-555-0199"),
      (2L, "no pii here, just words and 3.14 and 1.2.3 (not an ip)"),
      (3L, "edge 255.255.255.255 twice 1.1.1.1 and user_1%x@sub.domain.co")
    ).toDF("id", "text")
    val out = Pii.redact(df, "text").orderBy("id")
      .select("n_emails", "n_ips", "n_phones", "redacted")
      .collect()
    assert(out(0).getLong(0) == 2 && out(0).getLong(1) == 1 && out(0).getLong(2) == 1)
    assert(out(0).getString(3) == "mail [EMAIL] and [EMAIL], host [IP], call [PHONE]")
    assert(out(1).getLong(0) == 0 && out(1).getLong(1) == 0 && out(1).getLong(2) == 0)
    assert(out(1).getString(3) == "no pii here, just words and 3.14 and 1.2.3 (not an ip)")
    assert(out(2).getLong(0) == 1 && out(2).getLong(1) == 2)
    assert(out(2).getString(3) == "edge [IP] twice [IP] and [EMAIL]")
  }
}
