package graft

/** Dev tool: print the executed physical plan of one catalog query —
  * `runMain graft.Explain <sfDir> <queryName> [simple|formatted]`.
  * The plan-audit loop (push-down reached the scan? window limit pushed?
  * exchange reused?) reads this instead of guessing from timings.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, name) = args.take(2)
    val mode = args.drop(2).headOption.getOrElse("formatted")
    val spark = GraftSession.create(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
    val df = SparkEntry.queries(name)(spark, sfDir)
    mode match {
      case "simple" => println(df.queryExecution.executedPlan.toString)
      case _        => df.explain("formatted")
    }
    spark.stop()
  }
}
