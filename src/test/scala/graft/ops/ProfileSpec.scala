package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("expect: violation counts per rule in one pass; NULLs violate") {
    val df = Seq(
      (Some(5), "a"), (Some(-1), "b"), (None: Option[Int], "a"))
      .toDF("x", "cat")
    val asPairs = Profile.expect(df, Seq(
        "x_positive" -> (col("x") > 0),
        "cat_domain" -> col("cat").isin("a", "b")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // -1 fails, NULL cannot be shown positive -> 2 violations
    assert(asPairs("x_positive") == (2L, 3L))
    assert(asPairs("cat_domain") == (0L, 3L))
  }

  test("expect: single scan regardless of rule count") {
    val df = spark.range(100).toDF("id")
    val plan = Profile.expect(df, Seq(
        "a" -> (col("id") >= 0), "b" -> (col("id") < 100),
        "c" -> (col("id") % 2 === 0)))
      .queryExecution.executedPlan.toString
    assert("Range \\(".r.findAllIn(plan).length == 1,
      s"rules must share one scan:\n$plan")
  }

  test("expect: empty batch is vacuously clean (0 violations, never NULL)") {
    val empty = spark.range(0).select(col("id").as("x"))
    val got = Profile.expect(empty, Seq("pos" -> (col("x") > 0))).collect()(0)
    assert(!got.isNullAt(1) && got.getLong(1) == 0L && got.getLong(2) == 0L)
  }

  test("expect rejects an empty rule list") {
    intercept[IllegalArgumentException] {
      Profile.expect(spark.range(1).toDF("id"), Seq.empty)
    }
  }

  test("drift: identical snapshots score exactly zero; novel mass is NULL") {
    import spark.implicits._
    val docs = graft.core.Tables.documents(spark, graft.SparkSpec.Sf0001)
    val q = graft.ops.TextAnalysis.qualityScore(col("text"))
    // same relation on both sides: e = ref_n exactly, so every bucket's
    // chi-square contribution is exactly 0.0 (not merely small)
    val same = Profile.drift(docs, docs, q, buckets = 16).collect()
    assert(same.nonEmpty)
    assert(same.forall(r => !r.isNullAt(3) && r.getDouble(3) == 0.0))
    assert(same.forall(r => r.getLong(1) == r.getLong(2)))
    // a bucket present only in the current snapshot: NULL contribution
    // (novel mass, not a division by zero)
    val ref = Seq(0.1, 0.1, 0.2).toDF("s")
    val cur = Seq(0.1, 0.9).toDF("s")
    val got = Profile.drift(ref, cur, col("s"), buckets = 10)
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(got(9).isNullAt(3), "ref-absent bucket must be NULL")
    assert(!got(1).isNullAt(3))
    // a drifted distribution scores strictly positive somewhere
    assert(got.values.exists(r => !r.isNullAt(3) && r.getDouble(3) > 0))
  }

  test("outlierGate flags the far value and only it; NULLs count in n " +
      "but never flag") {
    val df = (Seq.fill(20)(10.0) :+ 1000.0).zipWithIndex
      .map { case (v, i) => ("a", Option(v)) }
      .toDF("k", "v")
      .union(Seq(("a", None: Option[Double]), ("b", Some(5.0)))
        .toDF("k", "v"))
    val g = Profile.outlierGate(df, "k", "v", z = 3.0)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(4), r.getDouble(5))).toMap
    assert(g("a")._1 == 22)          // 21 values + 1 NULL
    assert(g("a")._2 == 1)           // only the 1000.0
    assert(g("b") == ((1L, 0L, 0.0))) // singleton: sigma 0, no flag
  }

  test("quantilesExact: matches brute-force order statistics; sketch " +
      "estimate stays within one bin") {
    val rnd = new scala.util.Random(11)
    val vals = Seq.fill(1000)(rnd.nextDouble() * 100 - 50)
    val df = vals.toDF("v").repartition(4)
    val qs = Seq(0.1, 0.5, 0.9, 0.99, 1.0)
    val got = Profile.quantilesExact(df, "v", qs, bins = 32).collect()
    val sorted = vals.sorted
    got.foreach { r =>
      val (q, quant, est, within) =
        (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getBoolean(3))
      val pos = math.ceil(q * vals.size).toLong.max(1L).toInt
      assert(quant == sorted(pos - 1), s"q=$q exact order statistic")
      assert(within, s"q=$q estimate within one bin")
      assert(est <= quant, s"q=$q est is the bin lower edge")
    }
  }

  test("quantilesExact: all-equal values (zero width) and NULLs") {
    val df = (Seq.fill(10)(Some(7.5)) :+ (None: Option[Double])).toDF("v")
    val got = Profile.quantilesExact(df, "v", Seq(0.5, 1.0)).collect()
    got.foreach { r =>
      assert(r.getDouble(1) == 7.5 && r.getDouble(2) == 7.5 && r.getBoolean(3))
    }
  }

  test("correlations: perfect linear ±1, zero-variance NULL, " +
      "complete-case n") {
    val df = Seq(
      (1.0, 5.0, 10.0, Some(1.0)),
      (2.0, 7.0, 8.0, Some(2.0)),
      (3.0, 9.0, 6.0, None),
      (4.0, 11.0, 4.0, Some(4.0))).toDF("x", "y", "z", "w")
    // complete-case drops the None row everywhere
    val got = Profile.correlations(df, Seq("x", "y", "z", "w")).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]))))
      .toMap
    assert(got.size == 6)
    assert(got.values.forall(_._1 == 3L), "n = complete cases")
    assert(math.abs(got(("x", "y"))._2.get - 1.0) < 1e-12, "y = 2x+3")
    assert(math.abs(got(("x", "z"))._2.get + 1.0) < 1e-12, "z = -2x+12")
    assert(math.abs(got(("x", "w"))._2.get - 1.0) < 1e-12)
    // constant column over the complete cases: NULL, not NaN
    val const = Seq((1.0, 5.0), (2.0, 5.0), (3.0, 5.0)).toDF("a", "b")
    val g2 = Profile.correlations(const, Seq("a", "b")).collect()
    assert(g2.length == 1 && g2.head.isNullAt(3))
  }

  test("correlations: values quantize to the 0.01 grid (documented " +
      "contract)") {
    // sub-cent noise must not move the result: corr of the quantized
    // values is exactly 1
    val df = Seq((1.001, 2.004), (2.004, 4.001), (2.996, 6.004))
      .toDF("a", "b")
    val g = Profile.correlations(df, Seq("a", "b")).collect().head
    assert(math.abs(g.getDouble(3) - 1.0) < 1e-9)
  }

  test("quantilesByKey: per-key brute-force order statistics; NULL " +
      "key/value excluded; constant key handled") {
    val rnd = new scala.util.Random(5)
    val a = Seq.fill(500)(("a", Some(rnd.nextDouble() * 10)))
    val b = Seq.fill(300)(("b", Some(rnd.nextDouble() * 1000 - 500)))
    val c = Seq.fill(10)(("c", Some(42.0)))
    val noise = Seq((null.asInstanceOf[String], Some(1.0)), ("a", None))
    val df = (a ++ b ++ c ++ noise).toDF("k", "v")
    val qs = Seq(0.25, 0.5, 0.99)
    val got = Profile.quantilesByKey(df, "k", "v", qs, bins = 16)
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        ((r.getDouble(2), r.getBoolean(4)))).toMap
    assert(got.size == 9)
    val byKey = Map("a" -> a.map(_._2.get), "b" -> b.map(_._2.get),
      "c" -> c.map(_._2.get))
    for ((k, vs) <- byKey; q <- qs) {
      val sorted = vs.sorted
      val pos = math.ceil(q * vs.size).toLong.max(1L).toInt
      assert(got((k, q))._1 == sorted(pos - 1), s"($k, $q) exact")
      assert(got((k, q))._2, s"($k, $q) within one bin")
    }
  }

  test("driftServe over committed partials equals the batch gate; an " +
      "unmarked batch stays invisible until its marked retry") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files
      .createTempDirectory("graft_driftserve").toString
    val ref = (1 to 100).map(_ / 100.0).toDF("s")
    val cur1 = (1 to 40).map(_ / 50.0 / 2).toDF("s")   // skewed low
    val cur2 = (60 to 99).map(_ / 100.0).toDF("s")     // skewed high
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)))).toList
    IncrementalAgg.writeBatch(
      Profile.driftPartials(ref, col("s"), 8, asRef = true), dir, 0L)
    IncrementalAgg.writeBatch(
      Profile.driftPartials(cur1, col("s"), 8, asRef = false), dir, 1L)
    // batch 2 written WITHOUT its marker: a crashed ingest
    Profile.driftPartials(cur2, col("s"), 8, asRef = false)
      .write.mode("overwrite").parquet(s"$dir/data/batch=2")
    assert(rows(Profile.driftServe(spark, dir)) ==
      rows(Profile.drift(ref, cur1, col("s"), 8)),
      "serve == batch gate over committed rows only")
    // marked retry lands the batch; serve now covers both snapshots
    IncrementalAgg.writeBatch(
      Profile.driftPartials(cur2, col("s"), 8, asRef = false), dir, 2L)
    assert(rows(Profile.driftServe(spark, dir)) ==
      rows(Profile.drift(ref, cur1.union(cur2), col("s"), 8)))
  }

  test("ksTest: hand-computed D on overlapping samples, 0 for " +
      "identical, 1 for fully separated; d_at is the smallest argmax") {
    def df(xs: Double*) = xs.map(Tuple1(_)).toDF("v")
    // a=[1,2,3] b=[2,3,4]: mathematically |Fa-Fb| = 1/3 at v=1,2,3 —
    // but in IEEE doubles |1 − 2/3| = 0.33333333333333337 is strictly
    // LARGER than 1/3 = 0.3333333333333333, so the float max is
    // achieved only at v=3 (|1/3 − 0| at v=1 and |2/3 − 1/3| at v=2
    // both land on the smaller representation). The operator and the
    // SQL oracle compute the identical floats, so this is the pinned
    // contract, not noise.
    val r1 = Profile.ksTest(df(1, 2, 3), df(2, 3, 4), "v").head()
    assert(r1.getAs[Long]("n_a") == 3L && r1.getAs[Long]("n_b") == 3L)
    assert(r1.getAs[Double]("d_stat") == 1.0 - 2.0 / 3.0,
      s"D must be the IEEE |1 - 2/3|: $r1")
    assert(r1.getAs[Double]("d_at") == 3.0, s"float argmax is 3: $r1")
    assert(r1.getAs[Double]("ks_scaled") ==
      math.sqrt(3.0 * 3.0 / (3.0 + 3.0)) * r1.getAs[Double]("d_stat"))
    // identical samples: D = 0
    val r2 = Profile.ksTest(df(5, 6, 7), df(5, 6, 7), "v").head()
    assert(r2.getAs[Double]("d_stat") == 0.0)
    // fully separated: D = 1 achieved first at max(a) = 2
    val r3 = Profile.ksTest(df(1, 2), df(10, 11), "v").head()
    assert(r3.getAs[Double]("d_stat") == 1.0)
    assert(r3.getAs[Double]("d_at") == 2.0)
    // unequal sizes: a=[1] b=[1,2]: diff at 1 = |1 - 1/2| = 1/2
    val r4 = Profile.ksTest(df(1), df(1, 2), "v").head()
    assert(r4.getAs[Double]("d_stat") == 0.5 && r4.getAs[Double]("d_at") == 1.0)
  }

  test("referentialIntegrity: planted orphans and null keys count; " +
      "clean edges report zero") {
    val child = Seq(Some(1L), Some(2L), Some(9L), None)
      .toDF("ck")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = Profile.referentialIntegrity(Seq(
      ("edge", child, "ck", parent, "pk"))).head()
    assert(r.getString(0) == "edge")
    assert(r.getLong(1) == 4L)  // n_rows
    assert(r.getLong(2) == 1L)  // n_nulls
    assert(r.getLong(3) == 1L)  // n_orphans (9)
    assert(r.getDouble(4) == 0.25)
    val clean = Profile.referentialIntegrity(Seq(
      ("c", Seq(1L, 2L).toDF("ck"), "ck", parent, "pk"))).head()
    assert(clean.getLong(3) == 0L && clean.getLong(2) == 0L)
  }

  test("concentration: hand-computed Gini with ties; uniform values " +
      "give zero; top shares hit the boundary group exactly") {
    // values [1,1,3,5]: G = (2*32 - 5*10)/(4*10) = 0.35; top-1 entity
    // share = 5/10
    val df = Seq(1L, 1L, 3L, 5L).toDF("v")
    val r = Profile.concentration(df, "v").head()
    assert(r.getLong(0) == 4L && r.getLong(1) == 10L)
    assert(r.getDouble(2) == 0.35, s"gini: ${r.getDouble(2)}")
    assert(r.getLong(3) == 1L && r.getDouble(4) == 0.5)
    assert(r.getLong(5) == 1L && r.getDouble(6) == 0.5)
    // uniform: gini exactly 0, top-k share = k/n
    val u = Profile.concentration(
      Seq.fill(20)(7L).toDF("v"), "v").head()
    assert(u.getDouble(2) == 0.0)
    assert(u.getLong(5) == 2L && u.getDouble(6) == 0.1)
    // boundary inside a tie run: [4,4,4,4,2,2] n=6, S=20; top10% k=1
    // -> share 4/20
    val t = Profile.concentration(
      Seq(4L, 4L, 4L, 4L, 2L, 2L).toDF("v"), "v").head()
    assert(t.getLong(5) == 1L && t.getDouble(6) == 0.2)
  }

  test("benford: first digit from integer cents, sub-cent values " +
      "excluded, zero-observed digits present, chi2 positive") {
    val df = Seq(1.00, 19.99, 2.50, 0.005, 0.31, 9000.00).toDF("v")
    val rows = Profile.benford(df, "v").collect()
    assert(rows.length == 9)
    val obs = rows.map(r => r.getInt(0) -> r.getLong(1)).toMap
    // 1.00->1, 19.99->1, 2.50->2, 0.005 excluded, 0.31->3, 9000->9
    assert(obs == Map(1 -> 2L, 2 -> 1L, 3 -> 1L, 4 -> 0L, 5 -> 0L,
      6 -> 0L, 7 -> 0L, 8 -> 0L, 9 -> 1L), s"$obs")
    // expected counts scale to the 5 kept values
    val nexp = rows.map(_.getAs[Double]("n_expected")).sum
    assert(math.abs(nexp - 5.0) < 1e-9)
    val chi2 = rows.head.getAs[Double]("chi2")
    assert(chi2 > 0.0 && rows.forall(_.getAs[Double]("chi2") == chi2))
    // conforming-ish digit 1 share (2/5) is near benford 0.301: its
    // term must be far below digit 9's (1/5 vs 0.0458)
    val terms = rows.map(r => r.getInt(0) -> r.getAs[Double]("chi2_term")).toMap
    assert(terms(9) > terms(1))
  }

  test("tableChecksum: order/partitioning-invariant; boundary and NULL sensitive") {
    import spark.implicits._
    def fp(df: org.apache.spark.sql.DataFrame) =
      Profile.tableChecksum(df, Seq("a", "b")).collect().head
    val base = Seq(("x", "1"), ("y", "2"), ("z", "3")).toDF("a", "b")
    val shuffled = Seq(("z", "3"), ("x", "1"), ("y", "2")).toDF("a", "b")
      .repartition(7)
    assert(fp(base) === fp(shuffled))
    // any single-row change moves the sum digest
    val changed = Seq(("x", "1"), ("y", "2"), ("z", "4")).toDF("a", "b")
    assert(fp(base).getString(1) !== fp(changed).getString(1))
    // field boundaries: ("ab","c") != ("a","bc")
    assert(fp(Seq(("ab", "c")).toDF("a", "b")).getString(1) !==
      fp(Seq(("a", "bc")).toDF("a", "b")).getString(1))
    // NULL != '' != the string "NULL"
    val sums = Seq[(String, String)](("x", null), ("x", ""), ("x", "NULL"))
      .map(r => fp(Seq(r).toDF("a", "b")).getString(1))
    assert(sums.distinct.size === 3, s"$sums")
    // duplicate rows are counted (multiset, not set, semantics)
    assert(fp(base.union(base)).getLong(0) === 6L)
    assert(fp(base.union(base)).getString(1) !== fp(base).getString(1))
  }

  test("tableChecksumByKey: slice digests sum to the global; key not hashed") {
    import spark.implicits._
    val df = Seq(("k1", "x", "1"), ("k1", "y", "2"), ("k2", "z", "3"))
      .toDF("k", "a", "b")
    val by = Profile.tableChecksumByKey(df, Some("k"), Seq("a", "b"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), BigInt(r.getString(2)))).toMap
    assert(by.keySet === Set("k1", "k2"))
    assert(by("k1")._1 === 2L && by("k2")._1 === 1L)
    val global = Profile.tableChecksum(df, Seq("a", "b")).collect().head
    assert(BigInt(global.getString(1)) === by("k1")._2 + by("k2")._2,
      "slice sums must add to the global digest")
    // the key column does not enter the row hash: re-keying the same
    // rows leaves each row's digest (and so the global sum) unchanged
    val rekeyed = Seq(("q9", "x", "1"), ("q9", "y", "2"), ("q8", "z", "3"))
      .toDF("k", "a", "b")
    val g2 = Profile.tableChecksum(rekeyed, Seq("a", "b")).collect().head
    assert(g2.getString(1) === global.getString(1))
  }

  test("madOutliers: hand-computed medians, MAD, and the 3*MAD gate; " +
      "a zero-spread key reports mad 0 and no outliers") {
    import spark.implicits._
    val df = (Seq(1.0, 2.0, 3.0, 4.0, 100.0).map(("a", _)) ++
      Seq(5.0, 5.0, 5.0).map(("b", _))).toDF("k", "v")
    val r = Profile.madOutliers(df, "k", "v", k = 3.0)
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getDouble(2), x.getDouble(3), x.getLong(4),
          x.getDouble(5)))).toMap
    // key a: median at pos ceil(2.5)=3 -> 3.0; devs {2,1,0,1,97} ->
    // MAD 1.0; only 97 > 3*1 -> one outlier
    assert(r("a") === ((5L, 3.0, 1.0, 1L, 97.0)))
    // key b: constant values -> mad 0; 0 > 0 is false -> no outliers
    assert(r("b") === ((3L, 5.0, 0.0, 0L, 0.0)))
  }

  test("madOutliers: NULL keys and NULL values are excluded") {
    import spark.implicits._
    val df = Seq((Some("a"), Some(1.0)), (Some("a"), Some(2.0)),
      (Some("a"), Some(3.0)), (Some("a"), None), (None, Some(9.0)))
      .toDF("k", "v")
    val r = Profile.madOutliers(df, "k", "v").collect()
    assert(r.length == 1 && r.head.getLong(1) == 3L)
  }

  test("checksumPartials merge bit-identically to the one-pass " +
      "fingerprint; an unmarked batch directory stays invisible") {
    import spark.implicits._
    val df = spark.read.parquet(graft.SparkSpec.Sf0001 + "/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"), col("l_returnflag"))
    val cols = Seq("l_orderkey", "l_partkey", "l_returnflag")
    val whole = Profile.tableChecksum(df, cols).collect().head
    val path = java.nio.file.Files
      .createTempDirectory("graft_cksum_partials").toString
    IncrementalAgg.writeBatch(
      Profile.checksumPartials(df.filter(col("l_orderkey") % 2 === 0), cols),
      path, 0L)
    IncrementalAgg.writeBatch(
      Profile.checksumPartials(df.filter(col("l_orderkey") % 2 =!= 0), cols),
      path, 1L)
    val served = Profile.checksumServe(spark, path).collect().head
    assert(served.getLong(0) === whole.getLong(0))
    assert(served.getString(1) === whole.getString(1))
    assert(served.getLong(2) === whole.getLong(2))
    assert(served.getLong(3) === whole.getLong(3))
    // crash simulation: batch 2's data lands but its marker never does
    Profile.checksumPartials(df.limit(10), cols)
      .write.parquet(s"$path/data/batch=2")
    val after = Profile.checksumServe(spark, path).collect().head
    assert(after.getString(1) === whole.getString(1),
      "uncommitted batch must stay invisible to serving")
  }

  test("histogramPartials merge to the full histogram: served quantile " +
      "estimates stay within one bin of the exact order statistics") {
    import spark.implicits._
    val df = (1 to 1000).map(_.toDouble).toDF("v")
    val path = java.nio.file.Files
      .createTempDirectory("graft_quant_partials").toString
    IncrementalAgg.writeBatch(
      Profile.histogramPartials(df.filter(col("v") <= 500), "v",
        1.0, 1000.0, 64), path, 0L)
    IncrementalAgg.writeBatch(
      Profile.histogramPartials(df.filter(col("v") > 500), "v",
        1.0, 1000.0, 64), path, 1L)
    val served = Profile.quantileSketchServe(spark, path, df, "v",
      Seq(0.5, 0.9, 0.99), 1.0, 1000.0, 64).collect()
    assert(served.length == 3)
    // exact order statistics at positions 500/900/990
    assert(served.map(_.getDouble(1)).toSeq === Seq(500.0, 900.0, 990.0))
    assert(served.forall(_.getBoolean(3)), "every estimate within a bin")
  }

  test("histogramPartials: out-of-geometry values clamp into the edge " +
      "bins (frozen-geometry contract) rather than vanishing") {
    import spark.implicits._
    val batch = Seq(-5.0, 0.5, 99.5, 200.0).toDF("v")
    val h = Profile.histogramPartials(batch, "v", 0.0, 100.0, 10)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(h(0) == 2L && h(9) == 2L)
  }

  test("freshness: staleness vs the global watermark; trailing windows " +
      "are strict-greater boundaries; NULL ts excluded") {
    import spark.implicits._
    def ts(s0: String) = java.sql.Timestamp.valueOf(s0)
    val df = Seq(
      ("a", Some(ts("2024-01-10 00:00:00"))), // the watermark
      ("a", Some(ts("2024-01-09 00:00:00"))), // exactly 24h old: NOT in 1d
      ("b", Some(ts("2024-01-02 00:00:00"))), // 8 days: not in 7d
      ("b", None))
      .toDF("k", "ts")
    val r = Profile.freshness(df, "k", "ts").collect()
      .map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(3), x.getLong(4), x.getLong(5)))).toMap
    assert(r("a") === ((2L, 0L, 1L, 2L)),
      "exactly-24h-old row is outside the strict 1d window, inside 7d")
    assert(r("b") === ((1L, 8L * 86400000000L, 0L, 0L)))
  }

  test("bootstrapMeanCI: CI brackets the sample mean on a benign " +
      "column, bounds are actual replicate means, full mean exact") {
    import spark.implicits._
    val df = (1L to 200L).map(i => (i, 100L + (i % 11))).toDF("id", "v")
    val r = Profile.bootstrapMeanCI(df, "id", "v", reps = 64).collect().head
    val (n, mean, lo, hi, reps) = (r.getLong(0), r.getDouble(1),
      r.getDouble(2), r.getDouble(3), r.getLong(4))
    assert(n == 200L && reps == 64L)
    assert(mean == (1L to 200L).map(i => 100L + (i % 11)).sum.toDouble / 200)
    assert(lo <= hi)
    assert(lo <= mean && mean <= hi,
      s"95% CI should bracket the mean on a symmetric-ish sample: $r")
    // resampling a 100..110 population can't escape its range
    assert(lo >= 100.0 && hi <= 110.0)
  }

  test("bootstrapMeanCI: deterministic across runs (hash-driven " +
      "multiplicities, no RNG state)") {
    import spark.implicits._
    val df = (1L to 50L).map(i => (i, i)).toDF("id", "v")
    val a = Profile.bootstrapMeanCI(df, "id", "v", reps = 16).collect().head
    val b = Profile.bootstrapMeanCI(df, "id", "v", reps = 16).collect().head
    assert(a.getDouble(2) == b.getDouble(2) &&
      a.getDouble(3) == b.getDouble(3))
  }

  test("tableSketch: exact below k (est_is_exact), within 4*RSE of " +
      "countDistinct above k, partitioning-invariant, no Expand in the " +
      "plan, NULLs excluded from the sketch but counted in n_rows") {
    import spark.implicits._
    val li = graft.core.Tables.lineitem(spark, graft.SparkSpec.Sf0001)
    val cols = Seq("l_orderkey", "l_partkey", "l_linenumber",
      "l_returnflag", "l_linestatus")
    val k = 256
    val report = Profile.tableSketch(li, cols, k)
    val rows = report.collect()
      .map(r => r.getString(0) -> r).toMap
    val exact = Profile.table(li, cols).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val rse = 1.0 / math.sqrt(k - 2.0)
    cols.foreach { c =>
      val est = rows(c).getDouble(2)
      val isExact = rows(c).getBoolean(3)
      val ex = exact(c)
      if (ex < k) {
        assert(isExact && est == ex.toDouble,
          s"$c: below-k cardinality $ex must report exactly, got $est")
      } else {
        assert(!isExact, s"$c: $ex distinct must take the estimating path")
        assert(math.abs(est - ex) <= 4 * rse * ex,
          s"$c: est $est vs exact $ex exceeds 4*RSE (${4 * rse * ex})")
      }
    }
    // partitioning invariance: distinct-min is order-independent
    val repart = Profile.tableSketch(li.repartition(17), cols, k)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    cols.foreach(c => assert(repart(c) == rows(c).getDouble(2),
      s"$c: sketch estimate must not depend on partitioning"))
    // the point of the variant: no Expand in the physical plan
    val planSketch = report.queryExecution.executedPlan.toString
    assert(!planSketch.contains("Expand"),
      s"tableSketch must not plan through Expand:\n$planSketch")
    assert(Profile.table(li, cols).queryExecution.executedPlan
        .toString.contains("Expand"),
      "sanity: the exact profile DOES plan through Expand")
    // NULL handling: nulls never enter the sketch, rows still counted
    val withNulls = Seq(Some("a"), Some("b"), None, Some("a"))
      .toDF("v")
    val r = Profile.tableSketch(withNulls, Seq("v"), k = 8).collect().head
    assert(r.getLong(1) == 3L && r.getDouble(2) == 2.0 &&
      r.getBoolean(3) && r.getLong(7) == 4L)
  }

  test("sketchProfilePartials + serveSketchProfile: incremental serve " +
      "equals one-pass tableSketch bit-for-bit (semilattice merge); an " +
      "UNCOMMITTED batch is invisible until its marker lands") {
    import spark.implicits._
    val li = graft.core.Tables.lineitem(spark, graft.SparkSpec.Sf0001)
    val cols = Seq("l_orderkey", "l_partkey", "l_returnflag")
    val k = 64
    val dir = java.nio.file.Files.createTempDirectory("incprof").toString
    (0L to 2L).foreach { b =>
      IncrementalAgg.writeBatch(
        Profile.sketchProfilePartials(
          li.filter(col("l_orderkey") % 3 === b), cols, k), dir, b)
    }
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getBoolean(3))).toSeq
    val onePass = Profile.tableSketch(li, cols, k)
      .select("col_name", "n_nonnull", "n_distinct_est", "est_is_exact")
      .orderBy("col_name")
    assert(key(Profile.serveSketchProfile(spark, dir, k)
        .select("col_name", "n_nonnull", "n_distinct_est", "est_is_exact"))
      == key(onePass), "incremental serve must equal one-pass recompute")
    // drop batch 2's commit marker: the serve must fall back to 0+1 only
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir + "/commits/batch_2"), false)
    val partial = Profile.serveSketchProfile(spark, dir, k)
      .filter(col("col_name") === "l_orderkey").collect().head
    val expect01 = Profile.tableSketch(
        li.filter(col("l_orderkey") % 3 =!= 2), Seq("l_orderkey"), k)
      .collect().head
    assert(partial.getLong(1) == expect01.getLong(1) &&
      partial.getDouble(2) == expect01.getDouble(2),
      "unmarked batch must not serve")
  }

  test("driftSketch: per-side estimates within 4*RSE of countDistinct " +
      "(exact below k), jaccard_est within 4*RSE of exact Jaccard, " +
      "partitioning-invariant, no Expand in the plan") {
    val li = graft.core.Tables.lineitem(spark, graft.SparkSpec.Sf0001)
    val cols = Seq("l_orderkey", "l_partkey", "l_linenumber",
      "l_returnflag", "l_linestatus")
    val k = 256
    val ref = li.filter(col("l_orderkey") % 2 === 0)
    val cur = li.filter(col("l_orderkey") % 2 === 1)
    val report = Profile.driftSketch(ref, cur, cols, k)
    val rows = report.collect().map(r => r.getString(0) -> r).toMap
    val rse = 1.0 / math.sqrt(k - 2.0)
    def exactDistinct(df: org.apache.spark.sql.DataFrame, c: String): Long =
      df.agg(countDistinct(col(c))).collect().head.getLong(0)
    cols.foreach { c =>
      val r = rows(c)
      val (estR, estC) = (r.getDouble(1), r.getDouble(2))
      val (exR, exC) = (exactDistinct(ref, c), exactDistinct(cur, c))
      if (exR < k) assert(r.getBoolean(3) && estR == exR.toDouble,
        s"$c ref: below-k cardinality $exR must report exactly, got $estR")
      else assert(!r.getBoolean(3) && math.abs(estR - exR) <= 4 * rse * exR,
        s"$c ref: est $estR vs exact $exR exceeds 4*RSE")
      if (exC < k) assert(r.getBoolean(4) && estC == exC.toDouble,
        s"$c cur: below-k cardinality $exC must report exactly, got $estC")
      else assert(!r.getBoolean(4) && math.abs(estC - exC) <= 4 * rse * exC,
        s"$c cur: est $estC vs exact $exC exceeds 4*RSE")
      // exact Jaccard of the two distinct-value sets
      val exJ = {
        val a = ref.select(col(c)).na.drop().distinct()
        val b = cur.select(col(c)).na.drop().distinct()
        val i = a.intersect(b).count().toDouble
        val u = a.union(b).distinct().count().toDouble
        if (u == 0) -1.0 else i / u
      }
      val estJ = if (r.isNullAt(6)) -1.0 else r.getDouble(6)
      assert(math.abs(estJ - exJ) <= 4 * rse,
        s"$c: jaccard est $estJ vs exact $exJ exceeds 4*RSE (abs)")
      // the split makes l_orderkey fully churned, flags fully shared
      if (c == "l_orderkey") assert(estJ == 0.0)
      if (c == "l_returnflag") assert(estJ == 1.0)
    }
    // partitioning invariance: distinct-min and set ops are
    // order-independent
    val repart = Profile.driftSketch(
        ref.repartition(17), cur.repartition(13), cols, k)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2),
        if (r.isNullAt(6)) -1.0 else r.getDouble(6))).toMap
    cols.foreach { c =>
      val r = rows(c)
      assert(repart(c) == ((r.getDouble(1), r.getDouble(2),
        if (r.isNullAt(6)) -1.0 else r.getDouble(6))),
        s"$c: drift sketch must not depend on partitioning")
    }
    // the 100 TB point: no Expand anywhere in the physical plan
    val plan = report.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"),
      s"driftSketch must not plan through Expand:\n$plan")
  }
}
