package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Shims
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** [[graft.ops.TextAnalysis.qualityScore]] fused into ONE codegen'd pass
  * over the text — the [[GopherSignalsTable]] pattern applied to the
  * C4-style composite quality score.
  *
  * Why an expression: the Column formulation references its input ~14
  * times (length, punct regexp_replace, two stopword replaces, the
  * token-count split, each behind `when` guards). On a raw scan column
  * that is 14 cheap reads; but curation_pipeline filters on
  * `qualityScore(redact(text))`, and predicate pushdown substitutes the
  * 3-regexp redaction chain into EVERY reference — FilterExec does no
  * subexpression elimination (predicates short-circuit), so the gate
  * re-ran the redaction ~14× per row: 2.6 s of curation_pipeline's
  * 4.4 s at sf0.1 against 0.29 s for redaction itself. Fusing the score
  * makes the pushed-down predicate reference the redacted text exactly
  * once.
  *
  * EXACTNESS CONTRACT — bit-identical to the Column formulation
  * (`TextAnalysis.qualityScoreColumnForm`, the shape every DuckDB
  * oracle replays; QualityScoreSpec pins raw-bit equality):
  *  - lengths count CODE POINTS (Spark `length` == UTF8String.numChars);
  *  - punct ratio: code points NOT matching Java `[A-Za-z0-9\s]` (ASCII
  *    alnum + ASCII `\s` = [ \t\n\x0B\f\r] — no UNICODE_CHARACTER_CLASS
  *    in Spark's regexp) / total code points; 0.0 for empty text;
  *  - stop hits: non-overlapping leftmost occurrences of " the " and
  *    " a " via `(len − len(replace(text, m, ''))) / len(m)` — each an
  *    int/int Divide, i.e. (count·|m|).toDouble / |m|.toDouble (exact:
  *    integers < 2^53 divide exactly), summed as doubles;
  *  - token count: 0 for 0x20-only-trimmed-empty text, else Java
  *    `\s+`-split length of the trimmed text (Spark `trim` strips 0x20
  *    ONLY — not Java String.trim's ≤0x20);
  *  - score = least(cp/500.0, 1)·0.4 + (1 − punct)·0.3 +
  *    least(stopHits/tokens·4, 1)·0.3, left-associated double adds in
  *    exactly the Column tree's order; `least` == Math.min (no NaN can
  *    reach it: every ratio is finite-over-positive or guarded to 0.0).
  *
  * Scale shape: a pure projection — zero shuffles, participates in
  * whole-stage codegen via [[QualityScoreExpr.doGenCode]].
  */
object QualityScoreTable extends Serializable {

  // precompiled — String.split(regex) would Pattern.compile per row
  private val WsPattern = java.util.regex.Pattern.compile("\\s+")

  private def occCount(raw: String, m: String): Int = {
    var c = 0
    var j = raw.indexOf(m)
    while (j >= 0) { c += 1; j = raw.indexOf(m, j + m.length) }
    c
  }

  def quality(text: UTF8String): Double = {
    val raw = text.toString
    val cpLen = raw.codePointCount(0, raw.length)

    // punct: code points outside ASCII-alnum and Java \s
    var punct = 0
    var i = 0
    while (i < raw.length) {
      val cp = raw.codePointAt(i)
      val alnum = (cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z') ||
        (cp >= '0' && cp <= '9')
      val ws = cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B ||
        cp == '\f' || cp == '\r'
      if (!alnum && !ws) punct += 1
      i += Character.charCount(cp)
    }
    val punctRatio = if (cpLen == 0) 0.0 else punct.toDouble / cpLen.toDouble

    // stopwordRatio(" the ", " a ") — the exact int-Divide staging
    val occThe = (occCount(raw, " the ") * 5).toDouble / 5.0
    val occA = (occCount(raw, " a ") * 3).toDouble / 3.0
    val hits = occThe + occA
    // token count = \s+ separator runs + 1, NOT a materialized split:
    // Pattern.split(s, -1) keeps leading/trailing empties, so parts are
    // exactly (delimiter-run matches) + 1 for any non-empty input —
    // identical count with zero per-token String/array allocation on
    // the pushed-down-predicate hot path this fusion exists for
    // (QualityScoreSpec pins bit-equality incl. tab-leading and all-
    // whitespace inputs, where the leading/trailing-empty parts count)
    val trimmed = text.trim().toString // 0x20-only, Spark semantics
    val nTok =
      if (trimmed.isEmpty) 0L
      else {
        var seps = 0L
        val m = WsPattern.matcher(trimmed)
        while (m.find()) seps += 1
        seps + 1L
      }
    val stopRatio = if (nTok == 0L) 0.0 else hits / nTok.toDouble

    Math.min(cpLen.toDouble / 500.0, 1.0) * 0.4 +
      (1.0 - punctRatio) * 0.3 +
      Math.min(stopRatio * 4.0, 1.0) * 0.3
  }
}

/** Double quality score of a string column — see [[QualityScoreTable]]
  * for semantics and the exactness contract.
  */
case class QualityScoreExpr(child: Expression) extends UnaryExpression {

  override def prettyName: String = "quality_score"

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.simpleString}")
  }

  override def nullSafeEval(t: Any): Any =
    QualityScoreTable.quality(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("qualityScoreTable", QualityScoreTable,
      QualityScoreTable.getClass.getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $ref.quality($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object QualityScore {
  def quality(text: Column): Column =
    Shims.column(QualityScoreExpr(Shims.expression(text)))
}
