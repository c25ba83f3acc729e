package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** The standard Spark plug-in point for this library:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * injects the whole graft function family (the reference's UDAF
  * registry, src/api/planner.rs:134-136, plus the scalar kernels) into
  * every session built from that config — no `GraftSession` bootstrap
  * call needed, which is how a production cluster wires a library onto
  * sessions it does not construct (Thrift server, notebook kernels,
  * structured-streaming jobs launched by an orchestrator).
  *
  * `GraftSession.builder` remains the programmatic path; both routes
  * register through [[graft.functions.GraftFunctions.builders]], so the
  * function surface cannot diverge between them.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    graft.functions.GraftFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.GraftFunctions", name),
        builder))
    }
}
