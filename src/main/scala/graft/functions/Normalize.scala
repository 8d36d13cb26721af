package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Shims
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization as a codegen'd Catalyst Expression — the text
  * canonicalization step a multilingual training corpus needs before
  * any hash-keyed dedup: "café" composed (U+00E9) and decomposed
  * (e + U+0301) are byte-different, so exact dedup, MinHash shingles,
  * and tokenizer vocab lookups all silently treat visually identical
  * text as distinct until it is normalized.
  *
  * NFC (canonical composition) is the dedup-key form — DuckDB exposes
  * the same transform as `nfc_normalize`, which is what the `ta_nfc`
  * oracle hash-checks. NFKC additionally folds COMPATIBILITY variants
  * (ligatures, full-width forms, superscripts: ﬁ→fi, ５→5) — the
  * tokenizer-facing normalization SentencePiece applies by default;
  * no DuckDB counterpart exists, so its contract is spec-pinned.
  *
  * Shipped like [[WordPieceTokenize]]: a native UnaryExpression whose
  * codegen calls `java.text.Normalizer` directly (ICU-correct, ships
  * with the JVM), staying inside WholeStageCodegen — never a UDF. The
  * normal form rides into the generated code as an enum literal, so
  * there is no per-row dispatch.
  */
case class UnicodeNormalize(child: Expression, form: Normalizer.Form)
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unicode_normalize requires a string input, got ${other.simpleString}")
  }

  override def nullSafeEval(t: Any): Any =
    UTF8String.fromString(
      Normalizer.normalize(t.asInstanceOf[UTF8String].toString, form))

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  java.text.Normalizer.normalize($t.toString(),
         |    java.text.Normalizer.Form.${form.name()}));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Normalize {

  /** Canonical composition — the dedup-key form (DuckDB: nfc_normalize). */
  def nfc(text: Column): Column =
    Shims.column(UnicodeNormalize(Shims.expression(text), Normalizer.Form.NFC))

  /** Compatibility composition — the tokenizer-facing form (folds
    * ligatures/full-width/superscript variants; spec-pinned, no DuckDB
    * counterpart).
    */
  def nfkc(text: Column): Column =
    Shims.column(UnicodeNormalize(Shims.expression(text), Normalizer.Form.NFKC))
}
