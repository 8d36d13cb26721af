package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property tests for the round-8 operators, each against an
  * INDEPENDENT reference formulation computed driver-side: deletion
  * blocking vs a plain DP edit distance over all pairs, the funnel fold
  * vs the min-ts chain recurrence, sign packing vs a direct bit walk.
  */
class R10PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  /** Textbook DP Levenshtein — the reference the blocking must equal. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("property: deletion blocking finds EXACTLY the radius-1 pairs a " +
      "full quadratic scan finds") {
    // dense near-dup space: short strings over a 3-letter alphabet
    val word = Gen.choose(1, 5)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')))
      .map(_.mkString)
    val words = samples(word, 60).distinct
    val (l, r) = words.splitAt(words.size / 2)
    val left = l.zipWithIndex.map { case (w, i) => (i.toLong, w) }
    val right = r.zipWithIndex.map { case (w, i) => (1000L + i, w) }
    val got = EntityResolution.verifiedPairs(
        left.toDF("lid", "name"), "lid",
        right.toDF("rid", "name"), "rid", "name")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    val want = (for {
      (li, lw) <- left
      (ri, rw) <- right
      d = lev(lw, rw) if d <= 1
    } yield (li, ri, d.toLong)).toSet
    assert(got == want, s"blocking must equal the quadratic reference\n" +
      s"missing: ${want -- got}\nextra: ${got -- want}")
  }

  test("property: funnel depth equals the min-ts chain recurrence, with " +
      "and without a window") {
    val stages = Seq("s1", "s2", "s3")
    val evGen = for {
      n <- Gen.choose(0, 12)
      evs <- Gen.listOfN(n, for {
        ts <- Gen.choose(0, 20)
        st <- Gen.oneOf("s1", "s2", "s3", "zz")
      } yield (ts, st))
    } yield evs.zipWithIndex.map { case ((ts, st), i) => (i.toLong, ts, st) }
    val users = samples(evGen, 50)

    // reference: t1 = min ts of stage 1; t_{i+1} = min ts of stage i+1
    // with ts > t_i (and ts − t_i <= gap when windowed)
    def refDepth(evs: Seq[(Long, Int, String)], gap: Option[Int]): Int = {
      var last = Option.empty[Int]
      var depth = 0
      for (st <- stages) {
        if (depth == stages.indexOf(st)) {
          val qualifying = evs.filter(e => e._3 == st &&
            last.forall(t => e._2 > t && gap.forall(g => e._2 - t <= g)))
          if (qualifying.nonEmpty) {
            last = Some(qualifying.map(_._2).min)
            depth += 1
          }
        }
      }
      depth
    }

    val rows = users.zipWithIndex.flatMap { case (evs, u) =>
      evs.map { case (id, ts, st) =>
        (u.toLong, id, new Timestamp(ts * 1000L), st)
      }
    }
    val df = rows.toDF("user_id", "event_id", "ts", "event_type")
    for (gap <- Seq(None, Some(5L))) {
      val got = Funnel.userDepths(df, "user_id", "ts", "event_type",
          stages, gap)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      users.zipWithIndex.foreach { case (evs, u) =>
        val want = refDepth(evs, gap.map(_.toInt))
        val gotD = got.getOrElse(u.toLong, 0)
        assert(gotD == want,
          s"user $u gap $gap: fold=$gotD chain=$want events=$evs")
      }
    }
  }

  test("property: signBits round-trips the sign pattern and bit_count of " +
      "xor equals the sign-mismatch count") {
    val vecGen = Gen.listOfN(64,
      Gen.oneOf(Gen.choose(-5f, -1e-3f), Gen.choose(1e-3f, 5f)))
    val vecs = samples(vecGen, 30).map(_.toIndexedSeq)
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
      .select(col("id"), Similarity.signBits("v", 1).as("lo"),
        Similarity.signBits("v", 33).as("hi"))
    val packed = df.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    def refBits(v: IndexedSeq[Float], lo: Int): Long =
      (0 until 32).foldLeft(0L)((acc, j) =>
        if (v(lo - 1 + j) > 0) acc | (1L << j) else acc)
    vecs.zipWithIndex.foreach { case (v, i) =>
      assert(packed(i.toLong) == ((refBits(v, 1), refBits(v, 33))))
    }
    // pairwise: Hamming over the packed words == direct mismatch count
    for (i <- vecs.indices; j <- vecs.indices if i < j) {
      val (alo, ahi) = packed(i.toLong)
      val (blo, bhi) = packed(j.toLong)
      val viaBits =
        java.lang.Long.bitCount(alo ^ blo) + java.lang.Long.bitCount(ahi ^ bhi)
      val direct = vecs(i).zip(vecs(j)).count { case (x, y) =>
        (x > 0) != (y > 0)
      }
      assert(viaBits == direct)
    }
  }
}
