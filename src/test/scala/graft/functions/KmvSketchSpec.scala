package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[KmvBuffer]]'s state machine and [[KmvSketchAgg]]'s aggregate
  * contract: the sketch is EXACTLY the k smallest distinct values in
  * ascending order, under any insertion order, duplication, merge
  * split, or serialize/deserialize round-trip — the invariants the
  * kthMax fast-reject threshold must preserve.
  */
class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  private val K = 8

  private def minK(xs: Seq[Long], k: Int = K): Seq[Long] =
    xs.distinct.sorted.take(k)

  private def drain(b: KmvBuffer): Seq[Long] = {
    val it = b.set.iterator()
    Iterator.continually(it).takeWhile(_.hasNext).map(_.next().longValue())
      .toSeq
  }

  test("offer: k smallest distinct values in ascending order, any " +
      "insertion order; duplicates (including AT the threshold) ignored") {
    val xs = Seq(50L, 3L, 99L, 3L, 7L, 50L, 1L, 42L, 8L, 12L, 5L, 2L, 9L,
      12L, 4L, 100L, 6L)
    for (perm <- Seq(xs, xs.reverse, xs.sorted, xs.sortBy(-_))) {
      val b = new KmvBuffer(K)
      perm.foreach(b.offer)
      assert(drain(b) == minK(xs), s"insertion order $perm")
      // at capacity the threshold is the current k-th minimum
      assert(b.kthMax == minK(xs).last)
    }
    // duplicate of the current k-th minimum must not evict anything
    val b = new KmvBuffer(K)
    xs.foreach(b.offer)
    b.offer(b.kthMax)
    assert(drain(b) == minK(xs))
  }

  test("under capacity EVERYTHING is kept — including Long.MaxValue " +
      "(the threshold sentinel is never an accept/reject decision)") {
    val b = new KmvBuffer(K)
    Seq(Long.MaxValue, 5L, Long.MinValue, 0L).foreach(b.offer)
    assert(drain(b) == Seq(Long.MinValue, 0L, 5L, Long.MaxValue))
  }

  test("merge equals single-buffer over the union, for any split, " +
      "including early-exit paths and under-capacity sides") {
    val xs = (0L until 40L).map(i => (i * 7919L) % 101L)
    val whole = new KmvBuffer(K)
    xs.foreach(whole.offer)
    for (cut <- Seq(0, 1, 20, 39, 40)) {
      val (l, r) = xs.splitAt(cut)
      val a = new KmvBuffer(K); l.foreach(a.offer)
      val c = new KmvBuffer(K); r.foreach(c.offer)
      val agg = KmvSketchAgg(null, K)
      val merged = agg.merge(a, c)
      assert(drain(merged) == drain(whole), s"split at $cut")
      assert(merged.kthMax == whole.kthMax, s"threshold after split $cut")
    }
  }

  test("serialize/deserialize round-trips the exact sketch and a live " +
      "threshold (full and under-capacity buffers)") {
    val agg = KmvSketchAgg(null, K)
    for (n <- Seq(3, K, 30)) {
      val b = new KmvBuffer(K)
      (0 until n).map(i => ((i * 2654435761L) >>> 12) % 1000L)
        .foreach(b.offer)
      val rt = agg.deserialize(agg.serialize(b))
      assert(drain(rt) == drain(b), s"n=$n")
      // the restored buffer must still accept/reject correctly
      rt.offer(-1L); b.offer(-1L)
      assert(drain(rt) == drain(b), s"post-round-trip offer, n=$n")
    }
  }

  test("aggregate over a DataFrame matches brute force and is " +
      "partitioning-invariant") {
    val xs = (0L until 500L).map(i => (i * 48271L) % 257L)
    val expected = minK(xs, 16)
    for (parts <- Seq(1, 7, 32)) {
      val got = xs.toDF("h").repartition(parts)
        .agg(KmvSketch.kmv(col("h"), 16).as("s"))
        .collect()(0).getSeq[Long](0)
      assert(got == expected, s"parts=$parts")
    }
    // nulls are skipped (count-distinct semantics)
    val withNulls = Seq[Option[Long]](Some(5L), None, Some(1L), None)
      .toDF("h")
    val got = withNulls.agg(KmvSketch.kmv(col("h"), 4).as("s"))
      .collect()(0).getSeq[Long](0)
    assert(got == Seq(1L, 5L))
  }
}
