package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Shims
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The Gopher/MassiveText word- and line-level quality signals (Rae et
  * al. 2021 appendix A1.1 — the rules [[graft.ops.WebFilters]] states as
  * Column expressions) fused into ONE codegen'd pass over the text.
  *
  * Why an expression: the Column formulation re-derives the word array
  * and the line array from scratch inside EVERY signal (11 signals ×
  * interpreted `split`/`filter`/`transform`/`aggregate` HOF trees — and
  * in the `ta_gopher` query the chunked-text child is itself a
  * per-element HOF that each signal re-evaluates). Spark's array HOFs
  * do not participate in whole-stage codegen, so the suite cost 21.3 s
  * of the round-11 sf0.1 bench. This expression tokenizes once, lines
  * once, and computes every signal plus both keep decisions in a single
  * JVM pass with bounded per-row state — the [[GopherRepetitionFracs]]
  * pattern.
  *
  * Exactness contract (each item mirrors the WebFilters Column
  * semantics the DuckDB oracle was written against; GopherSignalsSpec
  * asserts bit-equality against the Column formulation on the fixture
  * corpus):
  *  - words = `filter(split(trim(text), "\\s+"), _ =!= "")`: Spark
  *    `trim` strips 0x20 ONLY; Java-regex split, empties dropped;
  *  - `length` counts CODE POINTS (`UTF8String.numChars` ==
  *    `String.codePointCount`);
  *  - mean word length = Σ cp(word) / nWords as int/int → the identical
  *    IEEE double in both engines; 0.0 for empty docs;
  *  - symbol ratio counts '#' occurrences plus NON-OVERLAPPING
  *    leftmost "..." matches (regexp_replace semantics) over the RAW
  *    (untrimmed) text, divided by nWords;
  *  - alpha fraction = words containing ≥1 ASCII letter / nWords;
  *  - stop hits = how many of the eight required stop words appear at
  *    least once (distinct presence, exact match);
  *  - lines = `split(text, "\r\n|[\r\n]")`, each 0x20-trimmed, empties
  *    dropped (all three line-ending conventions);
  *  - ellipsis fraction = lines ending in "..."; bullet fraction =
  *    lines whose first char is '-', '*' or '•' (U+2022);
  *  - duplicate-line fraction = 1 − distinct/lines; duplicate-line-char
  *    fraction = (Σcp(lines) − Σcp(distinct lines)) / Σcp(lines);
  *  - keep_no_stop = the published thresholds (50 ≤ words ≤ 100k, mean
  *    word length ∈ [3,10], symbol < 0.1, bullet < 0.9, ellipsis < 0.3,
  *    alpha > 0.8, dup-line < 0.3, dup-char < 0.2); keep additionally
  *    requires ≥ 2 stop-word hits.
  *
  * Scale shape: a pure projection — zero shuffles, zero explodes,
  * embarrassingly parallel over the corpus scan.
  */
object GopherSignalsTable extends Serializable {

  private val StopWords: Array[String] =
    Array("the", "be", "to", "of", "and", "that", "have", "with")

  // precompiled: String.split(regex) recompiles the Pattern per call for
  // any regex beyond its single-literal-char fast path — two avoidable
  // Pattern.compile per ROW on the hot projection this expression exists
  // to speed up. Pattern.split has identical semantics (limit -1).
  private val WsPattern = java.util.regex.Pattern.compile("\\s+")
  private val EolPattern = java.util.regex.Pattern.compile("\r\n|[\r\n]")

  // struct field order — keep in sync with GopherSignalsExpr.dataType
  // (n_words, mean_word_len, symbol_ratio, alpha_frac, stop_hits,
  //  ellipsis_frac, bullet_frac, dup_line_frac, dup_char_frac,
  //  keep, keep_no_stop)
  def signals(text: UTF8String): InternalRow = {
    val raw = text.toString

    // ---- word-level ------------------------------------------------------
    val trimmed = text.trim().toString // 0x20-only trim, Spark semantics
    val words0 =
      if (trimmed.isEmpty) Array.empty[String]
      else WsPattern.split(trimmed, -1)
    var nW = 0
    var cpSum = 0L
    var alphaHits = 0L
    val stopSeen = new Array[Boolean](StopWords.length)
    var i = 0
    while (i < words0.length) {
      val w = words0(i)
      if (!w.isEmpty) {
        nW += 1
        cpSum += w.codePointCount(0, w.length)
        var hasAlpha = false
        var j = 0
        while (!hasAlpha && j < w.length) {
          val c = w.charAt(j)
          if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')) hasAlpha = true
          j += 1
        }
        if (hasAlpha) alphaHits += 1
        var s = 0
        while (s < StopWords.length) {
          if (!stopSeen(s) && w == StopWords(s)) stopSeen(s) = true
          s += 1
        }
      }
      i += 1
    }
    var stopHits = 0L
    i = 0
    while (i < StopWords.length) { if (stopSeen(i)) stopHits += 1; i += 1 }

    // symbol counts over the RAW text (the Column form counts on the
    // un-trimmed input): '#' chars + non-overlapping leftmost "..."
    var hashes = 0L
    i = 0
    while (i < raw.length) { if (raw.charAt(i) == '#') hashes += 1; i += 1 }
    var dots = 0L
    i = raw.indexOf("...")
    while (i >= 0) { dots += 1; i = raw.indexOf("...", i + 3) }

    val meanWordLen = if (nW == 0) 0.0 else cpSum.toDouble / nW
    val symbolRatio = if (nW == 0) 0.0 else (hashes + dots).toDouble / nW
    val alphaFrac = if (nW == 0) 0.0 else alphaHits.toDouble / nW

    // ---- line-level ------------------------------------------------------
    val rawLines = EolPattern.split(raw, -1)
    var nLines = 0L
    var ellipsisLines = 0L
    var bulletLines = 0L
    var totalCp = 0L
    var distinctCp = 0L
    val seen = new java.util.HashSet[String]()
    i = 0
    while (i < rawLines.length) {
      var a = 0
      var b = rawLines(i).length
      while (a < b && rawLines(i).charAt(a) == ' ') a += 1
      while (b > a && rawLines(i).charAt(b - 1) == ' ') b -= 1
      if (b > a) {
        val l = rawLines(i).substring(a, b)
        nLines += 1
        if (l.endsWith("...")) ellipsisLines += 1
        val c0 = l.charAt(0)
        if (c0 == '-' || c0 == '*' || c0 == '•') bulletLines += 1
        val cp = l.codePointCount(0, l.length)
        totalCp += cp
        if (seen.add(l)) distinctCp += cp
      }
      i += 1
    }
    val ellipsisFrac = if (nLines == 0) 0.0 else ellipsisLines.toDouble / nLines
    val bulletFrac = if (nLines == 0) 0.0 else bulletLines.toDouble / nLines
    val dupLineFrac =
      if (nLines == 0) 0.0 else 1.0 - seen.size.toDouble / nLines
    val dupCharFrac =
      if (totalCp == 0) 0.0
      else (totalCp - distinctCp).toDouble / totalCp

    val keepNoStop =
      nW >= 50 && nW <= 100000 &&
        meanWordLen >= 3.0 && meanWordLen <= 10.0 &&
        symbolRatio < 0.1 &&
        bulletFrac < 0.9 &&
        ellipsisFrac < 0.3 &&
        alphaFrac > 0.8 &&
        dupLineFrac < 0.3 &&
        dupCharFrac < 0.2
    val keep = keepNoStop && stopHits >= 2L

    new GenericInternalRow(Array[Any](
      nW.toLong, meanWordLen, symbolRatio, alphaFrac, stopHits,
      ellipsisFrac, bulletFrac, dupLineFrac, dupCharFrac,
      keep, keepNoStop))
  }
}

/** `struct(n_words, mean_word_len, symbol_ratio, alpha_frac, stop_hits,
  * ellipsis_frac, bullet_frac, dup_line_frac, dup_char_frac, keep,
  * keep_no_stop)` of a text column — see [[GopherSignalsTable]] for
  * semantics and the exactness contract.
  */
case class GopherSignalsExpr(child: Expression) extends UnaryExpression {

  override def prettyName: String = "gopher_signals"

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("mean_word_len", DoubleType, nullable = false),
    StructField("symbol_ratio", DoubleType, nullable = false),
    StructField("alpha_frac", DoubleType, nullable = false),
    StructField("stop_hits", LongType, nullable = false),
    StructField("ellipsis_frac", DoubleType, nullable = false),
    StructField("bullet_frac", DoubleType, nullable = false),
    StructField("dup_line_frac", DoubleType, nullable = false),
    StructField("dup_char_frac", DoubleType, nullable = false),
    StructField("keep", BooleanType, nullable = false),
    StructField("keep_no_stop", BooleanType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.simpleString}")
  }

  override def nullSafeEval(t: Any): Any =
    GopherSignalsTable.signals(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gopherSignalsTable", GopherSignalsTable,
      GopherSignalsTable.getClass.getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $ref.signals($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GopherSignals {
  /** The full signal struct — compute ONCE per row (stage it with an
    * alias; the optimizer keeps a multiply-referenced non-trivial alias
    * staged), then read fields.
    */
  def all(text: Column): Column =
    Shims.column(GopherSignalsExpr(Shims.expression(text)))
}
