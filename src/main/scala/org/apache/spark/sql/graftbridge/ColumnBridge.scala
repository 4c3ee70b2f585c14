package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge.
  *
  * Spark 4 removed the public `new Column(expr)` constructor; the
  * supported conversion lives in `sql.classic.ExpressionUtils`, which is
  * `private[sql]`. This one-file subpackage of `org.apache.spark.sql`
  * re-exports exactly the two conversions — the established extension
  * technique for libraries shipping native Catalyst expressions (stateful
  * ones like [[graft.functions.BloomMightContain]] cannot go through the
  * temp-function registry: the expression closes over a per-call value,
  * so name-based binding either leaks an entry per call or rebinds
  * Columns to whichever value registered last).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
