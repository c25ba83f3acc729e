package graft.tools

import graft.{GraftSession, SparkEntry}

/** Plan audit helper: print a catalog entry's AQE-final executed plan
  * plus a one-line exchange census — the quick answer to "did this
  * rewrite add a shuffle".
  *
  * Usage: runMain graft.tools.Explain <sfDir> <entryName> [full]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, entry) = args.take(2)
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(entry)(spark, sfDir)
    // execute THIS QueryExecution (df.count() would plan a separate
    // query and leave this one's AdaptiveSparkPlan un-finalized — the
    // printout would show the INITIAL plan, not what actually ran)
    df.queryExecution.toRdd.count()
    val plan = df.queryExecution.executedPlan.toString
    println(s"[explain] $entry exchanges=" +
      "Exchange hashpartitioning".r.findAllIn(plan).length +
      " broadcasts=" + "BroadcastExchange".r.findAllIn(plan).length)
    if (args.length > 2 && args(2) == "full") println(plan)
    else plan.linesIterator
      .filter(l => l.contains("Exchange") || l.contains("Join"))
      .foreach(l => println("[explain] " + l.trim.take(160)))
    spark.stop()
  }
}
