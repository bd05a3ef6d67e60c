package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (canonical decomposition + canonical
  * composition, UAX #15) as a native codegen'd expression — Spark has
  * no builtin for it, and text curation needs it FIRST: the same
  * visible string can arrive precomposed (U+00E9 é) or decomposed
  * (e + U+0301) depending on the crawler/OS that produced the page, and
  * every downstream fingerprint (simhash, minhash, segment md5, exact
  * dedup) would treat those as different documents. Normalizing at
  * ingest makes the dedup family see one canonical byte stream.
  *
  * NFC (not NFK C) deliberately: canonical equivalence only — ligatures,
  * full-width forms and other compatibility variants carry signal that
  * quality scoring may want; NFC is the identity on them.
  *
  * The kernel delegates to `java.text.Normalizer` (ICU-equivalent
  * tables shipped with the JDK); the fast path short-circuits via
  * `Normalizer.isNormalized` — true for effectively all ASCII/Latin web
  * text — so the common case is one scan, no allocation. DuckDB's
  * `nfc_normalize` implements the same UAX #15 transform, which is what
  * lets normalized outputs hash-match across engines.
  *
  * No reference analog (centimators has no text layer); greenfield
  * SURVEY.md §7.6 scope.
  */
object NfcNormalize {

  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str,
        java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str,
      java.text.Normalizer.Form.NFC))
  }

  def apply(col: Column): Column =
    ColumnBridge.column(NfcNormalizeExpr(ColumnBridge.expression(col)))
}

case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"nfc_normalize requires string input, got ${child.dataType}")
  }
  override def nullSafeEval(input: Any): Any =
    NfcNormalize.compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NfcNormalize.compute($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
