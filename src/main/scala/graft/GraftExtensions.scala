package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{NfcExpr, SimhashExpr}

/** Session extensions registering graft's native Catalyst expressions
  * with the SQL function registry, so they're callable from SQL text and
  * `functions.call_function` on sessions built with
  * `spark.sql.extensions=graft.GraftExtensions` (every entry point here:
  * Verify, Bench, Main, the test session).
  *
  * Column-side code does NOT depend on this registration — the
  * [[graft.functions.SimhashExpr.simhash]] wrapper constructs the
  * expression directly, so driver-owned sessions that never saw the config
  * still run every query.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimhashExpr].getName, "simhash64"),
      (children: Seq[Expression]) => SimhashExpr(children.head)))
    ext.injectFunction((
      FunctionIdentifier("nfc"),
      new ExpressionInfo(classOf[NfcExpr].getName, "nfc"),
      (children: Seq[Expression]) => NfcExpr(children.head)))
  }
}
