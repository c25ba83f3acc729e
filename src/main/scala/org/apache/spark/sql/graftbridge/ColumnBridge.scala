package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> catalyst Expression bridge.
  *
  * Spark 4 made `Column` a thin wrapper over a connect-compatible
  * `ColumnNode`; the catalyst accessors (`ExpressionUtils.column` /
  * `.expression`) are `private[sql]`. Libraries that ship native codegen
  * expressions (graft.functions.DotLong et al.) need exactly these two
  * calls, so this one-file shim lives in the sql namespace — the same
  * pattern Spark-native libraries use. No other Spark internals are
  * touched from here.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
