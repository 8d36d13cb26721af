package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{lower, regexp_replace, trim}
import org.apache.spark.sql.graft.Shims
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Pure-JVM greedy WordPiece tokenizer — the real subword seam behind the
  * T5 truncation / token-counting contract (reference:
  * diagnostic_group_pipeline_with_api.py:49-69 tokenizes with a HF
  * WordPiece tokenizer; SURVEY.md §7.3 documented the whitespace stand-in
  * and this is the upgrade).
  *
  * Standard HF WordPiece max-munch semantics: each whitespace word is
  * consumed left-to-right, at every position taking the LONGEST vocab
  * piece that matches (continuation pieces carry the `##` prefix); a
  * position with no match turns the whole word into `[UNK]`.
  *
  * Shipped as a codegen'd Catalyst Expression, not a UDF: the vocab
  * table rides to executors via the codegen reference mechanism
  * (`addReferenceObj`), lookup structures build lazily once per JVM, and
  * the call stays inside WholeStageCodegen like a built-in. Tokenization
  * is deterministic, so the greedy walk is reproducible in the DuckDB
  * oracle as a longest-match-per-position table + recursive walk.
  */
final class WordPieceTable(val vocab: Seq[String]) extends Serializable {

  @transient private lazy val starts: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    vocab.foreach(p => if (!p.startsWith("##")) s.add(p))
    s
  }
  @transient private lazy val conts: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    vocab.foreach(p => if (p.startsWith("##")) s.add(p.substring(2)))
    s
  }
  @transient private lazy val maxStart: Int =
    vocab.iterator.filterNot(_.startsWith("##")).map(_.length).foldLeft(1)(math.max)
  @transient private lazy val maxCont: Int =
    vocab.iterator.filter(_.startsWith("##")).map(_.length - 2).foldLeft(1)(math.max)

  private def tokenizeWord(word: String, out: ArrayBuffer[UTF8String]): Unit = {
    val n = word.length
    val mark = out.length
    var start = 0
    while (start < n) {
      val atStart = start == 0
      val set = if (atStart) starts else conts
      var end = math.min(n, start + (if (atStart) maxStart else maxCont))
      var hit = -1
      while (end > start && hit < 0) {
        if (set.contains(word.substring(start, end))) hit = end else end -= 1
      }
      if (hit < 0) { // no piece fits -> the WHOLE word becomes [UNK]
        out.remove(mark, out.length - mark)
        out += WordPieceTable.Unk
        return
      }
      out += UTF8String.fromString(
        if (atStart) word.substring(start, hit) else "##" + word.substring(start, hit))
      start = hit
    }
  }

  // precompiled: String.split(regex) recompiles the Pattern on every
  // call for multi-char regexes — one avoidable Pattern.compile per ROW
  @transient private lazy val WsPattern =
    java.util.regex.Pattern.compile("\\s+")

  /** Tokenize a whitespace-separated text into WordPiece pieces. */
  def tokenize(text: UTF8String): ArrayData = {
    val out = new ArrayBuffer[UTF8String]()
    WsPattern.split(text.toString).foreach { w =>
      if (w.nonEmpty) tokenizeWord(w, out)
    }
    new GenericArrayData(out.toArray[Any])
  }
}

object WordPieceTable {
  private val Unk = UTF8String.fromString("[UNK]")
}

case class WordPieceTokenize(child: Expression, vocab: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"wordpiece_tokenize requires a string input, got ${other.simpleString}")
  }

  @transient private lazy val table = new WordPieceTable(vocab)

  override def nullSafeEval(t: Any): Any =
    table.tokenize(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordPieceTable", table,
      classOf[WordPieceTable].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $ref.tokenize($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordPiece {

  /** Fixture vocab for specs/oracle queries: every letter as both start
    * and continuation (so normalized alpha words never hit `[UNK]`) plus
    * multi-character pieces that exercise real greedy max-munch. A real
    * deployment passes its model's vocab file contents instead.
    */
  val FixtureVocab: Seq[String] =
    ('a' to 'z').map(_.toString) ++
      ('a' to 'z').map(c => s"##$c") ++
      Seq("the", "an", "and", "re", "in", "on", "at", "or", "th", "to", "of",
        "##ing", "##ed", "##er", "##es", "##tion")

  /** ASCII-fold + lowercase + collapse non-letters to spaces, in operations
    * with identical semantics in Spark and DuckDB (strip non-printable-
    * ASCII FIRST so case mapping never disagrees across engines).
    */
  def normalize(text: Column): Column =
    trim(regexp_replace(
      lower(regexp_replace(text, "[^\\x20-\\x7e]", "")), "[^a-z]+", " "))

  /** Load an HF-format `vocab.txt`: one piece per line, line order = token
    * id — the file that ships beside every BERT-family checkpoint (the
    * reference's registry tokenizer loads exactly this artifact;
    * diagnostic_group_pipeline_with_api.py:287-293). Special tokens
    * (`[PAD]`, `[UNK]`, `[CLS]`, ...) pass through as ordinary pieces —
    * they never match a normalized alpha word, so they cost nothing at
    * lookup time. Driver-side read; the pieces then ride to executors
    * INSIDE the expression via `addReferenceObj`, so a real 30k-entry
    * vocab ships once per executor JVM, not once per row or task.
    * Trailing CRs are stripped (Windows-written files) and blank lines
    * dropped; order is preserved (ids are positional in the HF format).
    * Opened through the Hadoop FileSystem API (not java.io) so the vocab
    * can live where checkpoint artifacts live at scale — hdfs:// or
    * s3a:// paths work exactly like local ones.
    */
  def loadVocab(path: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val conf = org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration())
    val reader = new java.io.BufferedReader(new java.io.InputStreamReader(
      p.getFileSystem(conf).open(p), java.nio.charset.StandardCharsets.UTF_8))
    try Iterator.continually(reader.readLine()).takeWhile(_ != null)
      .map(_.stripSuffix("\r")).filter(_.nonEmpty).toVector
    finally reader.close()
  }

  /** Greedy WordPiece pieces of an (already tokenizer-ready) string. */
  def tokenize(text: Column, vocab: Seq[String] = FixtureVocab): Column =
    Shims.column(WordPieceTokenize(Shims.expression(text), vocab))
}
