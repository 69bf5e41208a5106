package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for graft's native Catalyst expressions.
  *
  * Spark 4 unified `Column` over ColumnNode (the Connect-compatible AST)
  * and made the classic Expression conversions `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`) — there is no public
  * constructor from a catalyst `Expression` any more. Libraries that ship
  * native expressions bridge from inside the `org.apache.spark.sql`
  * namespace; this object is that bridge, kept to the two minimal
  * forwarders so nothing else of the private surface leaks into graft
  * code. (The session-registered route — SparkSessionExtensions +
  * `call_function` — also exists, see graft.GraftExtensions; the bridge
  * keeps column-side callers working on ANY session, registered or not.)
  */
object GraftColumns {

  def column(e: Expression): Column = ExpressionUtils.column(e)

  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
