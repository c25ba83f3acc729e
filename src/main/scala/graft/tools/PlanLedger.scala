package graft.tools

import java.nio.file.{Files, Paths}

import graft.{GraftSession, SparkEntry}
import graft.plans.PlanFingerprint

/** Regenerate (bless) the physical-plan regression ledger:
  * `runMain graft.tools.PlanLedger [sfDir] [out.json]` (defaults
  * `/root/testdata/sf0.001` and `PLANS.json`).
  *
  * The ledger holds one [[PlanFingerprint]] per catalog entry, one line
  * per entry so an intentional plan change shows up in `git diff` as the
  * exact fields that moved. `PlanLedgerSpec` recomputes every
  * fingerprint at HEAD and fails on any difference — the blessing
  * workflow is: make the change, re-run this tool, READ the diff (is
  * the extra exchange/join-strategy flip intended?), commit the ledger
  * with the change.
  */
object PlanLedger {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = args.drop(1).headOption.getOrElse("PLANS.json")
    val spark = GraftSession.create(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
    val lines = PlanFingerprint.withPinnedConf(spark) {
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val fp = PlanFingerprint.canonicalJson(fn(spark, sfDir))
        System.err.println(s"[plans] $name")
        s""""$name": $fp"""
      }
    }
    val json = "{\n\"sf_dir\": \"" + sfDir + "\",\n\"entries\": {\n" +
      lines.mkString(",\n") + "\n}\n}\n"
    Files.writeString(Paths.get(out), json)
    System.err.println(s"[plans] wrote ${lines.size} fingerprints to $out")
    spark.stop()
  }
}
