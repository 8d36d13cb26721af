package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint SELECTION (Schleimer, Wilkerson & Aiken 2003 —
  * the MOSS local fingerprinting algorithm) as one codegen'd per-row
  * pass: positional character-k-gram MD5s, the minimum of every sliding
  * window of `w` consecutive hashes (ties to the LEFTMOST), adjacent
  * re-selections deduped.
  *
  * Why an expression: the relational formulation (posexplode one row
  * per k-gram position → doc-partitioned sliding `min(struct)` window →
  * `distinct`) shuffles a corpus-sized positional hash relation — the
  * #1 bench cost at sf0.1 (22.8 s) and a 100 TB scale-killer. Selection
  * is a per-document computation with bounded state (a monotonic deque
  * of ≤ w indices), so it belongs INSIDE the row: this expression
  * shuffles nothing, and only the selected ~2/(w+1) density leaves the
  * scan stage.
  *
  * Exactness contract (mirrors the relational form the DuckDB oracle
  * replays, bit-for-bit):
  *  - k-gram `j` (1-based) = code points j..j+k-1 of the input (Spark
  *    `substr` semantics — code points, not chars; short texts yield
  *    their single partial k-gram, the empty text md5("") at pos 1);
  *  - positions 1..max(numCP-k+1, 1);
  *  - fp = lowercase-hex MD5 of the gram's UTF-8 bytes (= Spark/DuckDB
  *    `md5`); window minimum compares digests as unsigned bytes, which
  *    is exactly the hex string order both engines sort by, ties to the
  *    smaller position;
  *  - window starts 1..max(L-w+1, 1): full windows only, plus the
  *    single clamped window of a text shorter than w k-grams;
  *  - a position re-selected by the next overlapping window emits once
  *    (once selection moves off a position it can never be re-selected
  *    — any smaller candidate to its left has already left the window,
  *    so adjacent dedupe IS distinct).
  *
  * @return array of struct(pos BIGINT, fp STRING), in window order.
  */
final class WinnowTable(k: Int, w: Int) extends Serializable {

  private val HexDigits = "0123456789abcdef".toCharArray

  private def hex(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = HexDigits((d(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = HexDigits(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  def select(text: UTF8String): ArrayData = {
    val s = text.toString
    val bytes = s.getBytes(StandardCharsets.UTF_8)
    // byte offset of each code point (UTF-8 length derives from the
    // code point value — no second encoding pass)
    val nCP = s.codePointCount(0, s.length)
    val bOff = new Array[Int](nCP + 1)
    var ci = 0
    var cpi = 0
    var bo = 0
    while (ci < s.length) {
      val c = s.codePointAt(ci)
      bOff(cpi) = bo
      bo += (if (c < 0x80) 1 else if (c < 0x800) 2
        else if (c < 0x10000) 3 else 4)
      ci += Character.charCount(c)
      cpi += 1
    }
    bOff(nCP) = bo
    val L = math.max(nCP - (k - 1), 1)
    val md = MessageDigest.getInstance("MD5")
    val fps = new Array[Array[Byte]](L)
    var j = 0
    while (j < L) {
      val from = if (j <= nCP) bOff(j) else bo
      val to = if (j + k <= nCP) bOff(j + k) else bo
      md.reset()
      md.update(bytes, from, to - from)
      fps(j) = md.digest()
      j += 1
    }
    // sliding minimum via monotonic deque: pop while the new digest is
    // STRICTLY smaller (equal digests keep the earlier position, the
    // leftmost-tie rule); the front is the window's (fp, pos) minimum
    val starts = math.max(L - (w - 1), 1)
    val deque = new Array[Int](L)
    var head = 0
    var tail = 0
    var lastSel = -1
    val out = new ArrayBuffer[Any]()
    var next = 0 // next gram index to enter the deque
    var p = 0    // 0-based window start
    while (p < starts) {
      val end = math.min(p + w, L)
      while (next < end) {
        while (tail > head &&
            java.util.Arrays.compareUnsigned(fps(next), fps(deque(tail - 1))) < 0)
          tail -= 1
        deque(tail) = next
        tail += 1
        next += 1
      }
      while (deque(head) < p) head += 1
      val sel = deque(head)
      if (sel != lastSel) {
        out += new GenericInternalRow(
          Array[Any]((sel + 1).toLong, hex(fps(sel))))
        lastSel = sel
      }
      p += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** `array<struct<pos bigint, fp string>>` of winnowing-selected
  * fingerprints of a (pre-cleaned) text column — see [[WinnowTable]].
  */
case class WinnowSelect(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 2 && w >= 1, s"need k >= 2, w >= 1 (got k=$k, w=$w)")

  override def prettyName: String = "winnow_select"

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("pos", LongType, nullable = false),
      StructField("fp", StringType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.simpleString}")
  }

  @transient private lazy val table = new WinnowTable(k, w)

  override def nullSafeEval(t: Any): Any =
    table.select(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnowTable", table,
      classOf[WinnowTable].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $ref.select($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
