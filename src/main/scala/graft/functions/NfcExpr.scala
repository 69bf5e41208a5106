package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.GraftColumns
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Unicode NFC normalization (UAX #15
  * canonical composition via `java.text.Normalizer` — public platform
  * API): `string → string` INSIDE whole-stage codegen, the [[SimhashExpr]]
  * pattern. Web text arrives in mixed composition forms (combining marks
  * from some editors/CMSes, precomposed from others); every downstream
  * hash — exact dedup, MinHash shingles, SimHash, line dedup — treats
  * "café" and "café" as different bytes unless the pipeline
  * canonicalizes first, so NFC is the step a multilingual corpus runs
  * before any fingerprint. A Scala `udf` here would put a codegen boundary
  * on the full-corpus scan path; the native expression keeps the scan loop
  * fused.
  *
  * Null contract: propagates null (UnaryExpression's default null gate),
  * like [[SimhashExpr]].
  */
case class NfcExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def prettyName: String = "nfc"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(NfcExpr.nfc(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.NfcExpr.nfc($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): NfcExpr =
    copy(child = newChild)
}

object NfcExpr {

  /** The kernel: NFC with a fast already-normalized check (Normalizer
    * .isNormalized is a cheap scan; ASCII — the overwhelming web case —
    * short-circuits without allocating).
    */
  def nfc(s: String): String =
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) s
    else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)

  /** Column wrapper, usable on any session (no registration needed). */
  def nfcCol(c: Column): Column =
    GraftColumns.column(NfcExpr(GraftColumns.expression(c)))
}
