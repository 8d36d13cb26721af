package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Shims
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Viterbi segmentation under a UNIGRAM language model (the inference
  * half of SentencePiece's unigram tokenizer, Kudo 2018): a word is
  * segmented into the vocabulary pieces whose probability product is
  * maximal.
  *
  * Everything is pinned for cross-engine reproducibility (the DuckDB
  * oracle re-derives the same segmentation by enumerating ALL paths of
  * a recursive CTE and ranking):
  *  - piece probability = cnt/total, both exact integers, ONE IEEE
  *    double division — bit-identical in any engine;
  *  - a path's score multiplies probabilities LEFT-TO-RIGHT (the DP
  *    composes best(j−l)·p, the recursive CTE composes running·p —
  *    the same association, so the same doubles);
  *  - ties (equal score, including the all-zero-probability case when
  *    a kept-but-unused piece appears) break to the segmentation whose
  *    space-joined piece string is smallest in CODE-POINT order —
  *    decomposable prefix-wise (two segmentations of the same prefix
  *    can never be proper prefixes of each other as strings), so the
  *    per-position DP argmax reproduces the global rank-1 path.
  *
  * Output is the space-joined piece string; null when some position
  * has no matching piece (a character the training corpus never saw).
  * Shipped as a codegen'd Catalyst Expression like
  * [[WordPieceTokenize]]: the table rides via `addReferenceObj`, probs
  * build lazily once per JVM, rows stay inside WholeStageCodegen.
  */
final class UnigramTable(val pieces: Seq[(String, Long)], val total: Long,
                         val maxPieceLen: Int) extends Serializable {

  @transient private lazy val probs: java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double]()
    pieces.foreach { case (p, c) => m.put(p, c.toDouble / total.toDouble) }
    m
  }

  /** Code-point order — what UTF8String (Spark) and binary collation
    * (DuckDB) sort by; Java's String compare is UTF-16 code-unit order,
    * which disagrees above the BMP.
    */
  private def cpCompare(a: String, b: String): Int = {
    val la = a.length; val lb = b.length
    var i = 0
    while (i < la && i < lb) {
      val ca = a.codePointAt(i); val cb = b.codePointAt(i)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca)
    }
    Integer.compare(la, lb)
  }

  def segmentWord(w: String): String = {
    val n = w.length
    if (n == 0) return ""
    val score = new Array[Double](n + 1)
    val str = new Array[String](n + 1)
    score(0) = 1.0; str(0) = ""
    var j = 1
    while (j <= n) {
      var bestScore = -1.0
      var bestStr: String = null
      var l = 1
      val lMax = math.min(maxPieceLen, j)
      while (l <= lMax) {
        if (str(j - l) != null) {
          val piece = w.substring(j - l, j)
          val p = probs.get(piece)
          if (p != null) {
            val s = score(j - l) * p.doubleValue()
            val cand =
              if (str(j - l).isEmpty) piece else str(j - l) + " " + piece
            if (s > bestScore ||
                (s == bestScore && cpCompare(cand, bestStr) < 0)) {
              bestScore = s; bestStr = cand
            }
          }
        }
        l += 1
      }
      score(j) = bestScore; str(j) = bestStr
      j += 1
    }
    str(n) // null when unsegmentable
  }

  def segment(word: UTF8String): UTF8String = {
    val s = segmentWord(word.toString)
    if (s == null) null else UTF8String.fromString(s)
  }
}

case class UnigramSegment(child: Expression, table: UnigramTable)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unigram_segment requires a string input, got ${other.simpleString}")
  }

  override def nullSafeEval(t: Any): Any =
    table.segment(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramTable", table,
      classOf[UnigramTable].getName)
    nullSafeCodeGen(ctx, ev, t => s"""
      ${ev.value} = $ref.segment($t);
      ${ev.isNull} = (${ev.value} == null);""")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnigramSegment {
  def apply(word: Column, table: UnigramTable): Column =
    Shims.column(new UnigramSegment(Shims.expression(word), table))
}
