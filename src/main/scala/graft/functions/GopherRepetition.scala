package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Shims
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All Gopher repetition n-gram signals (Rae et al. 2021 A1.1 rules
  * #3-#11) in ONE codegen'd pass over the word array — the scan-stage
  * replacement for the higher-order-function formulation.
  *
  * Why this exists: Spark's array HOFs (`aggregate`, `zip_with`,
  * `array_sort`, `filter`) do NOT participate in whole-stage codegen —
  * they evaluate interpreted, one virtual call per array element. Nine
  * sorted-run folds per row over shifted-slice n-gram arrays cost 231 s
  * of a 838 s verify pass at sf0.01 (round-9 verdict); this expression
  * computes the identical nine fractions in a single JVM pass and stays
  * inside WholeStageCodegen like a built-in (the
  * [[WordPieceTokenize]] / [[UnigramViterbi]] pattern).
  *
  * Exactness contract (every detail mirrors the Column formulation the
  * DuckDB oracle was written against, so hashes are bit-identical):
  *  - words = `split(trim(text), "\\s+")`: Spark `trim` strips 0x20
  *    ONLY (`UTF8String.trim`), the split is Java regex with limit -1
  *    (leading `""` survives when the text starts with a tab/newline);
  *  - an empty-after-trim text yields 0.0 for every fraction; fewer
  *    words than n yields 0.0 for that n;
  *  - n-grams are the space-joined windows of `words`; `length` counts
  *    CODE POINTS (Spark `length` = `UTF8String.numChars`, DuckDB
  *    `length` likewise);
  *  - normalized chars = sum(word code points) + nWords - 1 (the
  *    single-space-joined stream both engines divide by);
  *  - top-n fraction = bestCount.toDouble * bestLen / normChars where
  *    best is max count, ties to the LONGER gram, then to the
  *    code-point-ascending smaller (= UTF-8 byte order = Spark string
  *    `<` = DuckDB memcmp — NOT Java's UTF-16 `compareTo`, which
  *    disagrees on supplementary characters);
  *  - dup-n fraction = min(1.0, (sum over grams with count >= 2 of
  *    count * len).toDouble / normChars) — every occurrence counts its
  *    full width, capped at 1.
  *
  * Scale shape: a pure projection — zero shuffles, zero explodes; the
  * per-row cost is O(sum_n (len * n)) character work with bounded
  * transient state, embarrassingly parallel over the corpus scan.
  */
final class GopherRepetitionTable(topNs: Array[Int], dupNs: Array[Int])
    extends Serializable {

  private val nFields = topNs.length + dupNs.length

  // precompiled: String.split(regex) recompiles the Pattern on every
  // call for multi-char regexes — one avoidable Pattern.compile per ROW
  @transient private lazy val WsPattern =
    java.util.regex.Pattern.compile("\\s+")

  /** Code-point order == UTF-8 byte order (what Spark string comparison
    * and the DuckDB oracle's `g ASC` both use).
    */
  private def cpCompare(a: String, b: String): Int = {
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca)
      j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  def fractions(text: UTF8String): InternalRow = {
    val out = new Array[Any](nFields)
    java.util.Arrays.fill(out.asInstanceOf[Array[AnyRef]],
      java.lang.Double.valueOf(0.0))
    val trimmed = text.trim() // spaces (0x20) only — Spark trim semantics
    if (trimmed.numBytes() == 0) return new GenericInternalRow(out)
    val words = WsPattern.split(trimmed.toString, -1)
    val nW = words.length
    val cp = new Array[Int](nW)
    var normChars = (nW - 1).toLong
    var i = 0
    while (i < nW) {
      cp(i) = words(i).codePointCount(0, words(i).length)
      normChars += cp(i)
      i += 1
    }
    // one counting pass per n; gram strings are space-joined windows
    def gramCounts(n: Int): java.util.HashMap[String, Array[Int]] = {
      val m = nW - n + 1
      val counts = new java.util.HashMap[String, Array[Int]](m * 2)
      val sb = new java.lang.StringBuilder()
      var s = 0
      while (s < m) {
        sb.setLength(0)
        var j = s
        var len = n - 1 // the joining spaces
        while (j < s + n) {
          if (j > s) sb.append(' ')
          sb.append(words(j))
          len += cp(j)
          j += 1
        }
        val c = counts.computeIfAbsent(sb.toString, _ => Array(0, len))
        c(0) += 1
        s += 1
      }
      counts
    }
    var f = 0
    while (f < topNs.length) {
      val n = topNs(f)
      if (nW >= n) {
        var bestCnt = 0
        var bestLen = 0
        var bestG: String = null
        val it = gramCounts(n).entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val cnt = e.getValue()(0)
          val len = e.getValue()(1)
          val better = cnt > bestCnt ||
            (cnt == bestCnt && (len > bestLen ||
              (len == bestLen && cpCompare(e.getKey, bestG) < 0)))
          if (better) { bestCnt = cnt; bestLen = len; bestG = e.getKey }
        }
        out(f) = bestCnt.toDouble * bestLen.toDouble / normChars.toDouble
      }
      f += 1
    }
    var g = 0
    while (g < dupNs.length) {
      val n = dupNs(g)
      if (nW >= n) {
        var dupChars = 0L
        val it = gramCounts(n).values().iterator()
        while (it.hasNext) {
          val v = it.next()
          if (v(0) >= 2) dupChars += v(0).toLong * v(1)
        }
        out(topNs.length + g) =
          math.min(1.0, dupChars.toDouble / normChars.toDouble)
      }
      g += 1
    }
    new GenericInternalRow(out)
  }
}

/** `struct(top{n}.. double, dup{n}.. double)` of the requested Gopher
  * repetition fractions of a text column — see [[GopherRepetitionTable]]
  * for semantics and the exactness contract.
  */
case class GopherRepetitionFracs(child: Expression, topNs: Seq[Int],
    dupNs: Seq[Int]) extends UnaryExpression {

  require((topNs ++ dupNs).forall(_ >= 2), "n-grams need n >= 2")

  override def prettyName: String = "gopher_rep_fracs"

  override def dataType: DataType = StructType(
    topNs.map(n => StructField(s"top$n", DoubleType, nullable = false)) ++
      dupNs.map(n => StructField(s"dup$n", DoubleType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.simpleString}")
  }

  @transient private lazy val table =
    new GopherRepetitionTable(topNs.toArray, dupNs.toArray)

  override def nullSafeEval(t: Any): Any =
    table.fractions(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gopherRepTable", table,
      classOf[GopherRepetitionTable].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $ref.fractions($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GopherRepetition {

  /** The full Gopher repetition table (top 2/3/4, dup 5..10) as one
    * struct column — compute ONCE per row (stage it with an alias; the
    * optimizer keeps a multiply-referenced non-trivial alias staged), then
    * read fields.
    */
  def allFracs(text: Column): Column =
    fracs(text, Seq(2, 3, 4), 5 to 10)

  /** Selected fractions only. */
  def fracs(text: Column, topNs: Seq[Int], dupNs: Seq[Int]): Column =
    Shims.column(GopherRepetitionFracs(Shims.expression(text), topNs, dupNs))
}
