package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as one native codegen'd expression — the
  * canonicalization step a web-scale text ingest runs before hashing,
  * deduplication or tokenization: the same visible string arrives both
  * precomposed (`é` U+00E9) and decomposed (`e` + U+0301) across
  * crawls, editors and OSes, and every downstream equality —
  * fingerprints (h4), MinHash shingles (e3), exact dedup (e1),
  * contamination probes (h8) — silently misses unless both spellings
  * collapse to one canonical form first.
  *
  * Semantics are the Unicode standard's NFC (canonical decomposition
  * then canonical composition, `java.text.Normalizer.Form.NFC`) — the
  * one normalization whose output is what users typed in the common
  * case (precomposed), hence the standard pick for corpus canonical
  * forms (W3C's choice for the web). NFC is idempotent and both
  * engines implement the same Unicode tables, so the DuckDB oracle
  * (`nfc_normalize`) reproduces the output byte-for-byte.
  *
  * Fast path: `Normalizer.isNormalized` over the decoded string avoids
  * the allocation for the overwhelmingly-common already-NFC input
  * (ASCII short-circuits inside the ICU tables); only strings that
  * actually need composing pay for a rebuild. A pure per-row
  * projection — zero shuffle, stays inside whole-stage codegen. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires STRING input, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.NfcNormalize.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
