package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.GraftColumns
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the 64-bit SimHash kernel
  * ([[graft.pipeline.Dedup.simhash64]], Charikar 2002): `string → long`
  * INSIDE whole-stage codegen — the generated Java calls the kernel
  * directly, so the per-document fingerprint pass stays in the same
  * compiled loop as the scan/projection around it. A Scala `udf` at the
  * same spot forces a codegen boundary (ScalaUDF wraps every row in a
  * null-checking closure call with catalyst↔Scala converters on both
  * sides); at corpus scale the fingerprint pass IS the scan, so the
  * boundary is pure overhead on 10^10 rows.
  *
  * Null contract: propagates null (UnaryExpression's default null gate) —
  * callers that need the kernel's "null text ≙ empty text ≙ 0L" semantics
  * coalesce first, which keeps the expression itself NullIntolerant-shaped
  * and therefore null-filter-pushable.
  */
case class SimhashExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    graft.pipeline.Dedup.simhash64(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.pipeline.Dedup.simhash64($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): SimhashExpr =
    copy(child = newChild)
}

object SimhashExpr {

  /** Column wrapper: `simhash64(text)` with the kernel's null≙empty
    * semantics (coalesce precedes the expression).
    */
  def simhash(c: Column): Column =
    GraftColumns.column(SimhashExpr(GraftColumns.expression(
      org.apache.spark.sql.functions.coalesce(
        c, org.apache.spark.sql.functions.lit("")))))
}
