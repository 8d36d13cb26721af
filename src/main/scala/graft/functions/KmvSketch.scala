package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Shims
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) distinct-count sketch as a
  * TypedImperativeAggregate: keeps the k smallest DISTINCT values of a
  * uniform hash column, in one pass, mergeable, with k·8-byte state.
  *
  * Why this exists when `countDistinct` gives the exact answer:
  * multi-column `countDistinct` plans through Expand — every input row
  * is replicated once per distinct set BEFORE the partial aggregate, so
  * a 5-column profile reads the corpus once but aggregates it six
  * times over (dq_profile's plan). At 100 TB on wide tables the Expand
  * multiplier is the profile's one avoidable term. The sketch pass
  * aggregates each row exactly once per column with bounded state.
  *
  * Estimator contract (Beyer et al. 2007, PODS — "On synopses for
  * distinct-value estimation under multiset operations"):
  *  - input is a uniform hash in [0, 2^52) (13 md5 hex digits — chosen
  *    ≤ 2^53 so the hash→double conversion downstream is EXACT in both
  *    engines rather than merely identically-rounded);
  *  - the sketch is the sorted array of the ≤ k smallest distinct
  *    hashes (exact distinct list while the column has < k distinct
  *    values — the estimate is then EXACT);
  *  - at k values: est = (k−1) / (h_k / 2^52), the unbiased KMV
  *    estimator, expected relative standard error ≈ 1/√(k−2);
  *  - deterministic: no RNG, no seed — the same data yields the same
  *    sketch in any partitioning (distinct-min is order-independent),
  *    so a DuckDB oracle replays it bit-for-bit (ORDER BY h LIMIT k
  *    over the distinct hashes).
  *
  * NULL hashes are skipped (SQL count-distinct semantics). The hash
  * staging is the caller's job ([[graft.ops.Profile.tableSketch]]) so
  * the same aggregate serves any hashable type.
  *
  * Output: array<long> of the ≤ k smallest distinct hashes, ascending.
  */
/** Mutable KMV state: a TreeSet of the current ≤ k minima plus the
  * cached k-th minimum as a PRIMITIVE rejection threshold. Once the
  * sketch is full, almost every corpus row takes the reject path — one
  * primitive compare, no boxing, no tree walk (a bare TreeSet would pay
  * an O(log k) last() descent plus a Long box per rejected row, on the
  * exact hot path this aggregate exists to make cheap).
  */
final class KmvBuffer(k: Int) {
  val set = new java.util.TreeSet[java.lang.Long]()
  /** Rejection threshold: the k-th smallest once FULL; only consulted
    * when set.size == k (under capacity everything is offered to the
    * set directly, so even h == Long.MaxValue is kept — the sentinel
    * init is never an accept/reject decision). At capacity,
    * h == kthMax is a duplicate of a present member — rejecting it is
    * correct.
    */
  var kthMax: Long = Long.MaxValue

  def offer(h: Long): Unit =
    if (set.size < k) {
      if (set.add(h) && set.size == k) kthMax = set.last()
    } else if (h < kthMax) {
      if (set.add(h)) { set.pollLast(); kthMax = set.last() }
    }

  /** True when nothing ≥ h can ever be accepted — the merge early-exit
    * test (only valid at capacity; under capacity everything accepts).
    */
  def saturatedAbove(h: Long): Boolean = set.size >= k && h >= kthMax
}

case class KmvSketchAgg(
    hashExpr: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] {

  require(k >= 3, "KMV needs k >= 3 (RSE ~ 1/sqrt(k-2))")

  override def children: Seq[Expression] = Seq(hashExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    hashExpr.dataType match {
      case LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"kmv_sketch requires a bigint hash input, got ${other.simpleString}")
    }

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val h = hashExpr.eval(input)
    if (h != null) buf.offer(h.asInstanceOf[Long])
    buf
  }

  override def merge(buf: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    val it = other.set.iterator()
    var continue = true
    while (continue && it.hasNext) {
      val h = it.next().longValue()
      // other.set iterates ascending: once buf is at capacity and h
      // reaches its threshold, nothing later can be accepted either
      if (buf.saturatedAbove(h)) continue = false else buf.offer(h)
    }
    buf
  }

  override def eval(buf: KmvBuffer): Any = {
    val out = new Array[Any](buf.set.size)
    val it = buf.set.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: KmvBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.set.size * 8)
    bb.putInt(buf.set.size)
    val it = buf.set.iterator()
    while (it.hasNext) bb.putLong(it.next().longValue())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new KmvBuffer(k)
    var i = 0
    while (i < n) { buf.offer(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(n: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketchAgg =
    copy(hashExpr = newChildren(0))
}

object KmvSketch {
  /** 2^52 — the hash domain bound; hashes stay exactly representable as
    * doubles on both engines.
    */
  val HashScale: Double = java.lang.Math.scalb(1.0, 52)

  /** Column API: sorted array of the ≤ k smallest distinct values of a
    * bigint hash column.
    */
  def kmv(hash: Column, k: Int): Column =
    Shims.column(KmvSketchAgg(Shims.expression(hash), k)
      .toAggregateExpression())
}
