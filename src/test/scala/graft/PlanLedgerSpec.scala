package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.PlanFingerprint

/** The physical-plan regression net, generalized from PlanAuditSpec's
  * hand-picked pins to the WHOLE catalog at BOTH pinned scales: every
  * entry's plan fingerprint (exchanges, join strategies, pushed filters,
  * pruning, codegen spans — see [[PlanFingerprint]]) must equal the
  * committed `PLANS.json` section for its scale. The oracle catches
  * wrong answers; this catches the silently WORSE plan — an extra
  * shuffle, a broadcast flipping to sort-merge, a pushdown lost in a
  * refactor — that leaves every value-level check green. The sf0.1
  * section exists because the sf0.001 plans are degenerate (single
  * partition, everything tiny): a regression that only manifests at real
  * data sizes — a data-derived strategy crossover picking the wrong arm,
  * a lost pushdown whose scan is one row at sf0.001 — passes the small
  * pins and fails here (VERDICT r15 #1).
  *
  * Blessing an intentional change:
  * {{{
  *   sbt "runMain graft.tools.PlanLedger"   # regenerates PLANS.json (both scales)
  *   git diff PLANS.json                    # READ it: is each moved field intended?
  *   git commit                             # the diff is the review artifact
  * }}}
  */
class PlanLedgerSpec extends AnyFunSuite {

  private val scaleDirs = Seq(
    "sf0.001" -> "/root/testdata/sf0.001",
    "sf0.1" -> "/root/testdata/sf0.1")
  private val ledgerPath = "PLANS.json"
  private def haveLedger = new java.io.File(ledgerPath).isFile

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Parse the ledger's per-entry canonical lines, section-aware. The
    * writer emits `"sfX": {` section headers with one `"name": {fp}`
    * line per entry (PlanLedger.main), so a line-scoped parse is exact —
    * no JSON library needed, and a mismatch report can quote the stored
    * line verbatim.
    */
  private def readLedger(): Map[String, Map[String, String]] = {
    val section = """^"(sf[^"]+)": \{$""".r
    val entry = """^"(q[^"]*)": (\{.*\})(,?)$""".r
    var cur = "?"
    val acc = scala.collection.mutable.Map
      .empty[String, scala.collection.mutable.Map[String, String]]
    scala.io.Source.fromFile(ledgerPath).getLines().foreach {
      case section(s) => cur = s
      case entry(name, fp, _) =>
        acc.getOrElseUpdate(cur, scala.collection.mutable.Map.empty)
          .update(name, fp)
      case _ => ()
    }
    acc.view.mapValues(_.toMap).toMap
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

  private def sweep(scale: String, dir: String): Unit = {
    assume(new java.io.File(dir).isDirectory, s"no testdata at $dir")
    assume(haveLedger, s"no $ledgerPath ledger committed")
    val ledgerAll = readLedger()
    assume(ledgerAll.contains(scale),
      s"$ledgerPath has no '$scale' section — bless with " +
        """sbt "runMain graft.tools.PlanLedger"""")
    val ledger = ledgerAll(scale)
    val entries = SparkEntry.queries
    val missing = entries.keySet -- ledger.keySet
    val stale = ledger.keySet -- entries.keySet
    assert(missing.isEmpty && stale.isEmpty,
      s"catalog/ledger key drift in section $scale — new entries " +
        s"${missing.toSeq.sorted} / removed entries ${stale.toSeq.sorted}; " +
        """bless with sbt "runMain graft.tools.PlanLedger" and review the git diff""")
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
      s"${diffs.size} entries drifted from the $scale plan ledger — if " +
        """intended, bless with sbt "runMain graft.tools.PlanLedger" and """ +
        s"review the git diff; if not, the refactor lost a plan property:\n" +
        diffs.mkString("\n"))
  }

  // one explicit declaration per scale (not a registration loop): every
  // test in this repo is a statically-declared `test(...)` call, which
  // ReadmeContractSpec counts to stamp the README's suite/test numbers
  test("every catalog entry's physical-plan fingerprint matches PLANS.json [sf0.001]") {
    sweep(scaleDirs(0)._1, scaleDirs(0)._2)
  }
  test("every catalog entry's physical-plan fingerprint matches PLANS.json [sf0.1]") {
    sweep(scaleDirs(1)._1, scaleDirs(1)._2)
  }

  test("the net FIRES on a deliberately worse plan (extra exchange)") {
    // proof the ledger is a live tripwire, not a tautology: inject the
    // exact regression class it exists to catch — one extra shuffle on a
    // pinned entry — and assert the fingerprint no longer matches the
    // committed line, moving on the `exchanges` field specifically
    val dir = scaleDirs.head._2
    assume(new java.io.File(dir).isDirectory, s"no testdata at $dir")
    assume(haveLedger, s"no $ledgerPath ledger committed")
    val ledger = readLedger()(scaleDirs.head._1)
    spark.catalog.clearCache()
    PlanFingerprint.withPinnedConf(spark) {
      val clean = SparkEntry.queries("q1_agg")(spark, dir)
      assert(PlanFingerprint.canonicalJson(clean) == ledger("q1_agg"),
        "precondition: the unperturbed entry must match its pin")
      val worse = PlanFingerprint.canonicalJson(clean.repartition(7))
      assert(worse != ledger("q1_agg"),
        "an extra repartition produced an identical fingerprint — the net is dead")
      val movedEx = fieldMap(worse)("exchanges") !=
        fieldMap(ledger("q1_agg"))("exchanges")
      assert(movedEx, "drift fired but not on the exchanges field: " +
        s"$worse vs ${ledger("q1_agg")}")
    }
  }
}
