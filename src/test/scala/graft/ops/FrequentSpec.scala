package graft.ops

import graft.SparkSpec

class FrequentSpec extends SparkSpec {
  import spark.implicits._

  test("heavyHitters: exact counts, complete above threshold, nothing below") {
    // skewed stream: item i appears 2^(10-i) times, i = 1..10, N = 1023
    val rows = (1 to 10).flatMap(i => Seq.fill(1 << (10 - i))(s"t$i"))
    val df = new scala.util.Random(7)
      .shuffle(rows).toDF("item").repartition(4)
    val n = rows.size.toDouble
    val thr = 0.02 // t1..t5 are above 2% of 1023; t6.. below
    val got = Frequent.heavyHitters(df, "item", thr, k = 64).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val want = rows.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 > thr * n).toMap
    assert(got.keySet == want.keySet, s"${got.keySet} vs ${want.keySet}")
    want.foreach { case (t, c) =>
      assert(got(t)._1 == c, s"$t exact count")
      assert(got(t)._2 == c / n, s"$t share")
    }
  }

  test("heavyHitters: guarantee precondition k+1 >= 1/threshold enforced") {
    val df = Seq("a", "b").toDF("item")
    intercept[IllegalArgumentException] {
      Frequent.heavyHitters(df, "item", threshold = 0.001, k = 10)
    }
  }

  test("heavyHitters: tiny-k sketch still finds the dominant item " +
      "across many partitions (the MG no-false-negative bound)") {
    // one item at 40%, the rest unique: k=2 counters must surface it
    val rows = Seq.fill(400)("big") ++ (1 to 600).map(i => s"u$i")
    val df = new scala.util.Random(3)
      .shuffle(rows).toDF("item").repartition(8)
    val got = Frequent.heavyHitters(df, "item", threshold = 0.3, k = 4)
      .collect()
    assert(got.length == 1 && got.head.getString(0) == "big" &&
      got.head.getLong(1) == 400L)
  }

  test("wsTokens: trims, splits on runs, drops empties") {
    val df = Seq("  a  b\tc ", "", "   ").toDF("text")
    val toks = Frequent.wsTokens(df, "text").as[String].collect().sorted
    assert(toks.toSeq == Seq("a", "b", "c"))
  }

  test("countMinSketch: estimates match a driver-side replay (never " +
      "underestimate), and disjoint-slice sketches merge cell-wise") {
    val items = (Seq.fill(5)("x") ++ Seq.fill(3)("y") ++ Seq("z"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    val sk = Frequent.countMinSketch(items, "t")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    // driver replay of the same hashing
    def bucket(j: Int, s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$j:$s".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      java.lang.Long.parseLong(hex, 16) % 512
    }
    val exact = Map("x" -> 5L, "y" -> 3L, "z" -> 1L)
    val expectedCells = exact.toSeq
      .flatMap { case (t, n) => (0 until 4).map(j => (j.toLong, bucket(j, t)) -> n) }
      .groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2).sum }
    assert(sk == expectedCells, s"cells $sk vs $expectedCells")
    val q = items.groupBy($"t").count().withColumnRenamed("count", "n_exact")
    val est = Frequent.cmsEstimate(
        Frequent.countMinSketch(items, "t"), q, "t")
      .collect().map(r => r.getAs[String]("t") ->
        (r.getAs[Long]("n_cms"), r.getAs[Long]("n_exact"))).toMap
    est.foreach { case (t, (cms, ex)) =>
      assert(cms >= ex, s"CMS must never underestimate: $t $cms < $ex")
      val replay = (0 until 4)
        .map(j => expectedCells((j.toLong, bucket(j, t)))).min
      assert(cms == replay, s"estimate replay mismatch for $t")
    }
    // mergeability: sketch(all) == cell-wise sum of the two halves
    val a = items.filter($"id" % 2 === 0)
    val b = items.filter($"id" % 2 === 1)
    val merged = Frequent.countMinSketch(a, "t")
      .unionByName(Frequent.countMinSketch(b, "t"))
      .groupBy($"j", $"bucket")
      .agg(org.apache.spark.sql.functions.sum($"cnt").as("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(merged == sk, "disjoint slices must merge cell-wise")
  }

  test("heavyHittersByKey: per-group exact counts and thresholds; " +
      "a token heavy in one group only surfaces there") {
    // group g1: 'hot' 50%, rest unique; g2: 'hot' is rare, 'cold' 60%
    val g1 = Seq.fill(50)("hot") ++ (1 to 50).map(i => s"a$i")
    val g2 = Seq.fill(60)("cold") ++ Seq.fill(2)("hot") ++
      (1 to 38).map(i => s"b$i")
    val df = new scala.util.Random(11)
      .shuffle(g1.map(("g1", _)) ++ g2.map(("g2", _)))
      .toDF("grp", "item").repartition(4)
    val got = Frequent.heavyHittersByKey(df, "grp", "item",
      threshold = 0.25, k = 16).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(got.keySet === Set(("g1", "hot"), ("g2", "cold")), s"$got")
    assert(got(("g1", "hot")) === ((50L, 0.5)))
    assert(got(("g2", "cold")) === ((60L, 0.6)))
    // null group rows are ignored, null items too
    val withNulls = df.union(Seq((null: String, "hot"),
      ("g1", null: String)).toDF("grp", "item"))
    assert(Frequent.heavyHittersByKey(withNulls, "grp", "item",
      threshold = 0.25, k = 16).count() === 2L)
  }
}
