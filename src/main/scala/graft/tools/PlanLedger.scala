package graft.tools

import java.nio.file.{Files, Paths}

import graft.{GraftSession, SparkEntry}
import graft.plans.PlanFingerprint

/** Regenerate (bless) the physical-plan regression ledger:
  * `runMain graft.tools.PlanLedger [sfDirs] [out.json]` (defaults
  * `/root/testdata/sf0.001,/root/testdata/sf0.1` and `PLANS.json`).
  *
  * The ledger holds one [[PlanFingerprint]] per catalog entry PER SCALE
  * (VERDICT r15 #1: the sf0.001 pins see degenerate single-partition
  * plans — a pushdown or strategy regression that only manifests at
  * real data sizes would sail past them; sf0.1 is the scale the bench
  * series runs at). Fingerprints are scale-split because several
  * operators make data-derived plan decisions that legitimately differ
  * across scales (fuzzy-join's measured auto-width crossover, label
  * propagation's diameter-bounded round count, trained-model shapes).
  *
  * One line per entry so an intentional plan change shows up in
  * `git diff` as the exact fields that moved. `PlanLedgerSpec`
  * recomputes every fingerprint at HEAD across BOTH scales and fails on
  * any difference — the blessing workflow is: make the change, re-run
  * this tool, READ the diff (is the extra exchange/join-strategy flip
  * intended?), commit the ledger with the change.
  */
object PlanLedger {
  def main(args: Array[String]): Unit = {
    val sfDirs = args.headOption
      .getOrElse("/root/testdata/sf0.001,/root/testdata/sf0.1")
      .split(",").toSeq
    val out = args.drop(1).headOption.getOrElse("PLANS.json")
    val spark = GraftSession.create(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
    val sections = sfDirs.map { sfDir =>
      val section = new java.io.File(sfDir).getName // "sf0.001"
      val lines = PlanFingerprint.withPinnedConf(spark) {
        SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
          val fp = PlanFingerprint.canonicalJson(fn(spark, sfDir))
          System.err.println(s"[plans] $section $name")
          s""""$name": $fp"""
        }
      }
      System.err.println(s"[plans] $section: ${lines.size} fingerprints")
      s""""$section": {""" + "\n" + lines.mkString(",\n") + "\n}"
    }
    val json = "{\n" + sections.mkString(",\n") + "\n}\n"
    Files.writeString(Paths.get(out), json)
    System.err.println(
      s"[plans] wrote ${sfDirs.size} scale sections to $out")
    spark.stop()
  }
}
