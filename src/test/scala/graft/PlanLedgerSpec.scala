package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.PlanFingerprint

/** The physical-plan regression net, generalized from PlanAuditSpec's
  * hand-picked pins to the WHOLE catalog: every entry's plan fingerprint
  * (exchanges, join strategies, pushed filters, pruning, codegen spans —
  * see [[PlanFingerprint]]) must equal the committed `PLANS.json`. The
  * oracle catches wrong answers; this catches the silently WORSE plan —
  * an extra shuffle, a broadcast flipping to sort-merge, a pushdown lost
  * in a refactor — that leaves every value-level check green.
  *
  * Blessing an intentional change:
  * {{{
  *   sbt "runMain graft.tools.PlanLedger"   # regenerates PLANS.json
  *   git diff PLANS.json                    # READ it: is each moved field intended?
  *   git commit                             # the diff is the review artifact
  * }}}
  */
class PlanLedgerSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"
  private val ledgerPath = "PLANS.json"
  private def haveData = new java.io.File(dir).isDirectory
  private def haveLedger = new java.io.File(ledgerPath).isFile

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Parse the ledger's per-entry canonical lines. The writer emits one
    * `"name": {fingerprint}` line per entry (PlanLedger.main), so a
    * line-scoped parse is exact — no JSON library needed, and a mismatch
    * report can quote the stored line verbatim.
    */
  private def readLedger(): Map[String, String] = {
    val line = """^"(q[^"]*)": (\{.*\})(,?)$""".r
    scala.io.Source.fromFile(ledgerPath).getLines().collect {
      case line(name, fp, _) => name -> fp
    }.toMap
  }

  private def fieldMap(canonical: String): Map[String, String] = {
    // fields are rendered `"k":v` with v either a scalar or a ["..."]
    // array whose strings never contain an unescaped `"` (the writer
    // escapes) — split on `,"` boundaries that start a new key
    val kv = """"([a-z_]+)":(.*)""".r
    canonical.stripPrefix("{").stripSuffix("}")
      .split(""",(?=\"[a-z_]+\":)""").toSeq.collect {
        case kv(k, v) => k -> v
      }.toMap
  }

  test("every catalog entry's physical-plan fingerprint matches PLANS.json") {
    assume(haveData, s"no testdata at $dir")
    assume(haveLedger, s"no $ledgerPath ledger committed")
    val ledger = readLedger()
    val entries = SparkEntry.queries
    val missing = entries.keySet -- ledger.keySet
    val stale = ledger.keySet -- entries.keySet
    assert(missing.isEmpty && stale.isEmpty,
      s"catalog/ledger key drift — new entries ${missing.toSeq.sorted} / " +
        s"removed entries ${stale.toSeq.sorted}; bless with " +
        """sbt "runMain graft.tools.PlanLedger" and review the git diff""")
    // an earlier suite's still-persisted frame would let the CacheManager
    // substitute InMemoryRelation into a matching subplan here, making
    // fingerprints order-dependent — sweep from a clean cache (suites run
    // sequentially in the forked test JVM, nothing is in flight)
    spark.catalog.clearCache()
    val diffs = scala.collection.mutable.ArrayBuffer.empty[String]
    PlanFingerprint.withPinnedConf(spark) {
      entries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        val now = PlanFingerprint.canonicalJson(fn(spark, dir))
        val want = ledger(name)
        if (now != want) {
          val nowF = fieldMap(now); val wantF = fieldMap(want)
          val moved = (nowF.keySet ++ wantF.keySet).toSeq.sorted.collect {
            case k if nowF.get(k) != wantF.get(k) =>
              s"$k: ${wantF.getOrElse(k, "∅")} -> ${nowF.getOrElse(k, "∅")}"
          }
          diffs += s"$name:\n    " + moved.mkString("\n    ")
        }
      }
    }
    assert(diffs.isEmpty,
      s"${diffs.size} entries drifted from the plan ledger — if intended, " +
        """bless with sbt "runMain graft.tools.PlanLedger" and review the """ +
        s"git diff; if not, the refactor lost a plan property:\n" +
        diffs.mkString("\n"))
  }
}
