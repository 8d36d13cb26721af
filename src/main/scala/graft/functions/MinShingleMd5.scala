package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Shims
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The minimum MD5 over all character-k-gram shingles of a text — the
  * min-shingle-hash robust fingerprint (the 1-hash MinHash special
  * case: identical under any edit that leaves the minimizing shingle
  * intact) — as ONE codegen'd pass over the UTF-8 bytes.
  *
  * Why an expression: the Column formulation
  * `array_min(transform(charShingles(c, k), md5))` materializes a
  * numCP-element array of substring UTF8Strings, `array_distinct`s it
  * (a per-row hash set build that cannot change a MIN), md5s each into
  * a 32-char hex string, and reduces — all interpreted, one virtual
  * call per element per step: 18.2 s of the round-11 sf0.1 bench for
  * 5 000 × ~300-char docs. This expression walks the text's UTF-8
  * bytes once (code-point lead-byte offsets), digests each k-gram's
  * byte slice directly (no substring/hex-string allocation), and keeps
  * the byte-wise-minimum digest — hex order == unsigned byte order, so
  * comparing raw digests IS comparing the hex strings both engines
  * sort by.
  *
  * Exactness contract (mirrors [[graft.ops.Dedup.charShingles]] +
  * `md5` + `array_min`, which the DuckDB oracle restates):
  *  - shingle j (1-based) = code points j..j+k-1 (Spark `substr`
  *    semantics), positions 1..max(numCP-k+1, 1) — a text shorter
  *    than k yields its single partial shingle, the empty text
  *    md5("");
  *  - md5 = lowercase hex of the shingle's UTF-8 bytes (Spark/DuckDB
  *    `md5`);
  *  - result = the lexicographically smallest hex string. `distinct`
  *    in the Column form is a no-op under MIN and is skipped.
  *
  * Scale shape: a pure projection — zero shuffles, zero array
  * materialization, O(bytes) per row with one 16-byte running state.
  */
object MinShingleMd5Table extends Serializable {

  private val HexChars = "0123456789abcdef".toCharArray

  def minShingle(text: UTF8String, k: Int): UTF8String = {
    val bytes = text.getBytes
    // byte offset of each code point (+ end sentinel). The step uses
    // Spark's OWN lead-byte classifier, so the walk is definitionally
    // identical to numChars() and to substr's stepping — including on
    // MALFORMED UTF-8 (parquet doesn't validate; a stray continuation
    // byte steps 1 in Spark, and a hand-rolled `< 0xe0 → 2` walk would
    // silently diverge from the Column formulation there)
    val offs = new Array[Int](text.numChars() + 1)
    var nCp = 0
    var b = 0
    while (b < bytes.length) {
      offs(nCp) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      nCp += 1
    }
    offs(nCp) = bytes.length
    val m = math.max(nCp - k + 1, 1)
    val md = MessageDigest.getInstance("MD5")
    val best = new Array[Byte](16)
    var j = 0
    while (j < m) {
      val from = offs(j)
      val until = offs(math.min(j + k, nCp))
      md.reset()
      md.update(bytes, from, until - from)
      val d = md.digest()
      if (j == 0 || unsignedLess(d, best)) System.arraycopy(d, 0, best, 0, 16)
      j += 1
    }
    val hex = new Array[Char](32)
    var i = 0
    while (i < 16) {
      hex(2 * i) = HexChars((best(i) >> 4) & 0xf)
      hex(2 * i + 1) = HexChars(best(i) & 0xf)
      i += 1
    }
    UTF8String.fromString(new String(hex))
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val ai = a(i) & 0xff
      val bi = b(i) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    false
  }
}

/** `min(md5(shingle))` over the char-k-gram shingles of a string column
  * — see [[MinShingleMd5Table]] for semantics and the exactness
  * contract.
  */
case class MinShingleMd5Expr(child: Expression, k: Int)
    extends UnaryExpression {

  require(k >= 1, s"shingle width must be >= 1 (got $k)")

  override def prettyName: String = "min_shingle_md5"

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.simpleString}")
  }

  override def nullSafeEval(t: Any): Any =
    MinShingleMd5Table.minShingle(t.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minShingleTable", MinShingleMd5Table,
      MinShingleMd5Table.getClass.getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $ref.minShingle($t, $k);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinShingleMd5 {
  def apply(text: Column, k: Int): Column =
    Shims.column(MinShingleMd5Expr(Shims.expression(text), k))
}
