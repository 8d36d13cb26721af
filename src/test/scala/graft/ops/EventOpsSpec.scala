package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EventOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def ev(rows: (Long, Long, String, String, Double)*) =
    rows.toDF("event_id", "user_id", "t", "event_type", "value")
      .withColumn("ts", col("t").cast("timestamp")).drop("t")

  test("transitions: counts adjacent pairs per user, probabilities sum to 1") {
    val e = ev(
      (1L, 1L, "2024-01-01 00:00:01", "view", 0.0),
      (2L, 1L, "2024-01-01 00:00:02", "click", 0.0),
      (3L, 1L, "2024-01-01 00:00:03", "view", 0.0),
      (4L, 2L, "2024-01-01 00:00:01", "view", 0.0),
      (5L, 2L, "2024-01-01 00:00:02", "click", 0.0))
    val m = EventOps.transitions(e, "user_id", "ts", "event_type", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toList
    // view->click twice (both users), click->view once
    assert(m === List(("click", "view", 1L, 1.0),
      ("view", "click", 2L, 1.0)))
  }

  test("transitions: equal timestamps break ties by the tie column") {
    val e = ev(
      (2L, 1L, "2024-01-01 00:00:01", "click", 0.0),
      (1L, 1L, "2024-01-01 00:00:01", "view", 0.0))
    val m = EventOps.transitions(e, "user_id", "ts", "event_type", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1))).toList
    assert(m === List(("view", "click"))) // event_id 1 sorts before 2
  }

  test("attribution: last strictly-preceding touch wins; no touch = direct") {
    val e = ev(
      (1L, 1L, "2024-01-01 00:00:01", "view", 0.0),
      (2L, 1L, "2024-01-01 00:00:02", "click", 0.0),
      (3L, 1L, "2024-01-01 00:00:03", "purchase", 10.0),
      (4L, 2L, "2024-01-01 00:00:01", "purchase", 5.0), // nothing before
      (5L, 3L, "2024-01-01 00:00:01", "view", 0.0),
      (6L, 3L, "2024-01-01 00:00:02", "purchase", 7.0),
      (7L, 3L, "2024-01-01 00:00:03", "purchase", 2.0)) // still view
    val a = EventOps.lastTouchAttribution(e, "user_id", "ts", "event_type",
        "event_id", Seq("click", "view", "signup"), "purchase", "value")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toList
    assert(a === List(("(direct)", 1L, 5.0), ("click", 1L, 10.0),
      ("view", 2L, 9.0)))
  }

  test("attribution: a touch at the conversion's own instant does not count") {
    val e = ev(
      (1L, 1L, "2024-01-01 00:00:01", "click", 0.0),
      (2L, 1L, "2024-01-01 00:00:01", "purchase", 3.0))
    // click shares the timestamp but sorts before by event_id → in frame
    val a = EventOps.lastTouchAttribution(e, "user_id", "ts", "event_type",
        "event_id", Seq("click"), "purchase", "value")
      .collect().map(_.getString(0)).toList
    assert(a === List("click"))
    // reversed ids: purchase sorts first → frame is empty → direct
    val e2 = ev(
      (2L, 1L, "2024-01-01 00:00:01", "click", 0.0),
      (1L, 1L, "2024-01-01 00:00:01", "purchase", 3.0))
    val a2 = EventOps.lastTouchAttribution(e2, "user_id", "ts", "event_type",
        "event_id", Seq("click"), "purchase", "value")
      .collect().map(_.getString(0)).toList
    assert(a2 === List("(direct)"))
  }

  test("gapFillDaily: zero-fills gaps over the clock window and carries " +
      "revenue forward") {
    val facts = ev(
      (1L, 1L, "2024-01-02 10:00:00", "purchase", 4.0),
      (2L, 1L, "2024-01-02 11:00:00", "purchase", 6.0),
      (3L, 1L, "2024-01-04 10:00:00", "purchase", 1.0))
    val clock = ev(
      (9L, 9L, "2024-01-01 00:00:00", "view", 0.0),
      (10L, 9L, "2024-01-05 00:00:00", "view", 0.0))
    val g = EventOps.gapFillDaily(facts, clock, "user_id", "ts", "value")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toList
    assert(g === List(
      (1L, "2024-01-01", 0L, 0.0),   // before first fact: zero
      (1L, "2024-01-02", 2L, 10.0),
      (1L, "2024-01-03", 0L, 10.0),  // gap: count 0, revenue carried
      (1L, "2024-01-04", 1L, 1.0),
      (1L, "2024-01-05", 0L, 1.0)))  // after last fact: carried
  }

  test("rollingActiveUsers: window extension counts a user once, " +
      "cover days clip at the data's last day") {
    // user 1 active on day 1 and 2; user 2 on day 1 only; last day = 3
    val e = ev(
      (1L, 1L, "2024-01-01 08:00:00", "view", 0.0),
      (2L, 1L, "2024-01-01 09:00:00", "view", 0.0), // same user+day: dedup
      (3L, 1L, "2024-01-02 08:00:00", "view", 0.0),
      (4L, 2L, "2024-01-01 08:00:00", "view", 0.0),
      (5L, 3L, "2024-01-03 08:00:00", "view", 0.0))
    val g = EventOps.rollingActiveUsers(e, "user_id", "ts", Seq(1, 3))
      .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(g == Map(
      (1, "2024-01-01") -> 2L,  // users 1, 2
      (1, "2024-01-02") -> 1L,  // user 1
      (1, "2024-01-03") -> 1L,  // user 3
      (3, "2024-01-01") -> 2L,
      (3, "2024-01-02") -> 2L,  // 1 (active twice in window: once) + 2
      (3, "2024-01-03") -> 3L), // all three within the trailing 3 days
      s"got $g")
  }

  test("rollingActiveUsersSketch: estimates gate within tolerance and " +
      "exact counts match the exact operator") {
    val e = ev((1 to 60).map(i =>
      (i.toLong, (i % 20).toLong, f"2024-01-${i % 5 + 1}%02d 08:00:00",
        "view", 0.0)): _*)
    val exact = EventOps.rollingActiveUsers(e, "user_id", "ts", Seq(1, 3))
      .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val g = EventOps.rollingActiveUsersSketch(e, "user_id", "ts", Seq(1, 3))
      .collect()
    assert(g.nonEmpty)
    g.foreach { r =>
      assert(r.getLong(2) == exact((r.getInt(0), r.getString(1))),
        "exact column must equal the exact operator")
      assert(r.getBoolean(3), s"HLL estimate within tolerance: $r")
    }
  }

  test("rollingActiveUsersServeSketch: an unmarked sketch batch stays " +
      "invisible until its marked retry") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_austream").toString
    val half1 = ev((1 to 10).map(i =>
      (i.toLong, i.toLong, "2024-01-01 08:00:00", "view", 0.0)): _*)
    val half2 = ev((11 to 30).map(i =>
      (i.toLong, i.toLong, "2024-01-02 08:00:00", "view", 0.0)): _*)
    val all = half1.unionByName(half2)
    IncrementalAgg.writeBatch(
      EventOps.dailyUserSketches(half1, "user_id", "ts"), dir, 0L)
    // crashed batch: sketch data without its marker
    EventOps.dailyUserSketches(half2, "user_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/data/batch=1")
    def counts(events: org.apache.spark.sql.DataFrame) =
      EventOps.rollingActiveUsersServeSketch(spark, dir, events,
        "user_id", "ts", Seq(1)).collect()
        .map(r => r.getString(1) -> r.getLong(2)).toMap
    // served sketches cover only day 1; the gate's exact side is the
    // caller's events — use half1 so exact matches the committed state
    assert(counts(half1) == Map("2024-01-01" -> 10L))
    IncrementalAgg.writeBatch(
      EventOps.dailyUserSketches(half2, "user_id", "ts"), dir, 1L)
    assert(counts(all) == Map("2024-01-01" -> 10L, "2024-01-02" -> 20L))
  }

  test("abUserFlags merge: per-user max over slices equals batch flags; " +
      "an unmarked flag batch stays invisible until its marked retry") {
    import org.apache.spark.sql.functions.max
    val dir = java.nio.file.Files
      .createTempDirectory("graft_abstream").toString
    val half1 = Seq((2L, "view"), (4L, "view"), (1L, "view"))
      .toDF("user_id", "event_type")
    val half2 = Seq((2L, "purchase"), (3L, "view"), (3L, "purchase"))
      .toDF("user_id", "event_type")
    def flags(df: org.apache.spark.sql.DataFrame) =
      EventOps.abUserFlags(df, "user_id", "event_type", "view", "purchase")
    IncrementalAgg.writeBatch(flags(half1), dir, 0L)
    // crashed batch: flag rows without the marker
    flags(half2).write.mode("overwrite").parquet(s"$dir/data/batch=1")
    def serve() = {
      val st = graft.core.IndexCommits.servedState(spark, dir)
      val merged = spark.read.parquet(s"$dir/data")
        .filter(col("batch").isin(st.batches: _*))
        .groupBy($"__u")
        .agg(max($"__exp").as("__exp"), max($"__conv").as("__conv"))
      EventOps.abTestReadout(merged).collect().head
    }
    val before = serve()
    assert((before.getLong(0), before.getLong(1), before.getLong(2),
      before.getLong(3)) === ((2L, 0L, 1L, 0L)),
      "unmarked flag batch must stay invisible")
    IncrementalAgg.writeBatch(flags(half2), dir, 1L)
    val after = serve()
    // merged == batch abTest over the union (user 2 converts across
    // slices; user 3 exposed+converted in slice 2 only)
    val batch = EventOps.abTest(half1.unionByName(half2), "user_id",
      "event_type", "view", "purchase").collect().head
    assert(after === batch, s"stream serve $after != batch $batch")
  }

  test("dailyAnomalies: the spike day flags, steady days don't, " +
      "constant series z-scores 0") {
    // type a: 1 event/day for 10 days, then a 6-event spike on day 11
    // (z = 4.5455/1.4374 ~ 3.16 — note a single outlier among n days
    // caps at z = sqrt(n-1), so 5 steady days could never clear 2.0)
    val aDays = (1 to 10).map(d =>
      (d.toLong, 1L, f"2024-01-$d%02d 10:00:00", "a", 0.0)) ++
      (20 to 25).map(i => (i.toLong, 1L, "2024-01-11 10:00:00", "a", 0.0))
    // type b: exactly 2 events on each of 3 days — zero variance
    val bDays = for { d <- 1 to 3; k <- 0 to 1 }
      yield ((100 + d * 10 + k).toLong, 1L, f"2024-01-0$d 11:0$k:00", "b", 0.0)
    val e = ev(aDays ++ bDays: _*)
    val g = EventOps.dailyAnomalies(e, "event_type", "ts", z = 2.0)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(4), r.getBoolean(5)))).toMap
    val aVals = g.filter(_._1._1 == "a")
    assert(aVals.size == 11)
    assert(g(("a", "2024-01-11")) == ((6L,
      g(("a", "2024-01-11"))._2, true)), "spike day must flag")
    assert(math.abs(g(("a", "2024-01-11"))._2 - 3.1623) < 1e-3)
    assert(aVals.filter(_._1._2 != "2024-01-11").forall(!_._2._3),
      "steady days must not flag")
    val bVals = g.filter(_._1._1 == "b")
    assert(bVals.size == 3)
    assert(bVals.forall(v => v._2._2 == 0.0 && !v._2._3),
      s"constant series: z=0, no flags: $bVals")
  }

  test("sessionize: an exactly-30-minute gap stays in the SAME session " +
      "(session_window merges when newStart <= currentEnd, boundary " +
      "INCLUSIVE - fixture-verified; the oracle's strict > 1800000000 " +
      "pin matches), while one microsecond past the gap splits") {
    // gap == 30 min exactly: merged
    val merged = EventOps.sessionize(ev(
        (1L, 1L, "2024-01-01 00:00:00", "view", 1.0),
        (2L, 1L, "2024-01-01 00:30:00", "view", 1.0)),
      "user_id", "ts", "value").collect()
    assert(merged.length == 1 && merged.head.getLong(2) == 2L,
      s"exact-gap event must merge into the session: ${merged.toSeq}")
    // gap == 30 min + 1 ms: split
    val split = EventOps.sessionize(ev(
        (1L, 1L, "2024-01-01 00:00:00", "view", 1.0),
        (2L, 1L, "2024-01-01 00:30:00.001", "view", 1.0)),
      "user_id", "ts", "value").collect()
    assert(split.length == 2,
      s"past-gap event must open a new session: ${split.toSeq}")
  }

  test("growthAccounting: new/retained/resurrected/churned per week " +
      "with gap-resurrect and next-week churn attribution") {
    // 2024-01-01 is a Monday. user 1: wk0, wk1, wk3 (gap at wk2);
    // user 2: wk0 only.
    val e = ev(
      (1L, 1L, "2024-01-03 10:00:00", "view", 0.0), // wk0
      (2L, 1L, "2024-01-08 00:00:00", "view", 0.0), // wk1
      (3L, 1L, "2024-01-24 23:59:59", "view", 0.0), // wk3
      (4L, 2L, "2024-01-05 12:00:00", "view", 0.0)) // wk0
    val got = EventOps.growthAccounting(e, "user_id", "ts")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getDouble(5))))
    assert(got.toSeq == Seq(
      ("2024-01-01", 2L, 0L, 0L, 0L, None),
      ("2024-01-08", 0L, 1L, 0L, 1L, Some(0.0)), // user 2 churns
      ("2024-01-15", 0L, 0L, 0L, 1L, Some(0.0)), // user 1's gap week
      ("2024-01-22", 0L, 0L, 1L, 0L, None),      // user 1 resurrects
      ("2024-01-29", 0L, 0L, 0L, 1L, Some(0.0))), // user 1 final churn
      s"got: ${got.toSeq}")
  }

  test("markovStationary: alternating chain stays uniform; sink state " +
      "absorbs under the self-loop patch") {
    def ev(rows: (Long, Long, String, String)*) =
      rows.toSeq.toDF("event_id", "user_id", "ts0", "event_type")
        .withColumn("ts", to_timestamp($"ts0")).drop("ts0")
    // user 1: a b a b a -> P(a->b)=1, P(b->a)=1; stationary = uniform
    val alt = ev(
      (1L, 1L, "2024-01-01 00:01:00", "a"),
      (2L, 1L, "2024-01-01 00:02:00", "b"),
      (3L, 1L, "2024-01-01 00:03:00", "a"),
      (4L, 1L, "2024-01-01 00:04:00", "b"),
      (5L, 1L, "2024-01-01 00:05:00", "a"))
    val g1 = EventOps.markovStationary(alt, "user_id", "ts",
        "event_type", "event_id", iters = 6)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(g1 == Map("a" -> 0.5, "b" -> 0.5), s"$g1")
    // a -> b always, b never leaves (sink; self-loop patch): all mass
    // flows to b after one iteration and stays
    val sink = ev(
      (1L, 1L, "2024-01-01 00:01:00", "a"),
      (2L, 1L, "2024-01-01 00:02:00", "b"),
      (3L, 2L, "2024-01-01 00:01:00", "a"),
      (4L, 2L, "2024-01-01 00:02:00", "b"))
    val g2 = EventOps.markovStationary(sink, "user_id", "ts",
        "event_type", "event_id", iters = 4)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(g2 == Map("a" -> 0.0, "b" -> 1.0), s"$g2")
  }

  test("ewmaDaily matches the α=1/2 recursion exactly") {
    // type a: daily counts 4, 6, 8 → ewma 4, 5, 6.5; type b: 6 → 6
    val rows =
      (1 to 4).map(i => (i.toLong, 1L, "2024-01-01 0" + i + ":00:00", "a", 0.0)) ++
      (5 to 10).map(i => (i.toLong, 1L, "2024-01-02 05:0" + (i - 5) + ":00", "a", 0.0)) ++
      (11 to 18).map(i => (i.toLong, 1L, "2024-01-03 10:0" + (i - 11) + ":00", "a", 0.0)) ++
      Seq.tabulate(6)(i => (20L + i, 2L, "2024-01-02 05:0" + i + ":00", "b", 0.0))
    val ev = rows.toDF("event_id", "user_id", "ts0", "event_type", "value")
      .withColumn("ts", to_timestamp($"ts0")).drop("ts0")
    val got = EventOps.ewmaDaily(ev, "event_type", "ts")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      ("a", "2024-01-01", 4L, 4.0),
      ("a", "2024-01-02", 6L, 5.0),
      ("a", "2024-01-03", 8L, 6.5),
      ("b", "2024-01-02", 6L, 6.0)),
      s"ewma mismatch: ${got.toSeq}")
  }

  test("abTest: hand-computed 2x2 chi-square; unexposed and null users excluded") {
    // variant A (even ids): users 2,4,6,8 exposed; 2,4 converted
    // variant B (odd ids): users 1,3,5 exposed; 5 converted
    // user 10: purchase only, never viewed -> excluded entirely
    // null user row must not crash or count
    val rows = Seq[(java.lang.Long, String)](
      (2L, "view"), (4L, "view"), (6L, "view"), (8L, "view"),
      (2L, "purchase"), (4L, "purchase"),
      (1L, "view"), (3L, "view"), (5L, "view"), (5L, "purchase"),
      (10L, "purchase"), (null, "view"))
    val ev = rows.toDF("user_id", "event_type")
    val r = EventOps.abTest(ev, "user_id", "event_type",
      "view", "purchase").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((4L, 2L, 3L, 1L)))
    assert(r.getDouble(4) === 0.5 && math.abs(r.getDouble(5) - 1.0 / 3) < 1e-15)
    // a=2 b=2 c=1 d=2 N=7: chi2 = 7*(2*2-2*1)^2/(4*3*3*4) = 28/144
    val expected = 7.0 * 4.0 / 144.0
    assert(math.abs(r.getDouble(6) - expected) < 1e-12, s"chi2=${r.getDouble(6)}")
  }

  test("cohortLtv: hand-computed triangle — offsets, cumulative revenue, ltv") {
    // cohort week of 2024-01-01 (Mon): users 1,2 first seen that week
    // cohort 2024-01-08: user 3
    val ev = Seq(
      (1L, "2024-01-01 10:00:00", 10.0),
      (2L, "2024-01-03 10:00:00", 5.0),
      (1L, "2024-01-09 10:00:00", 2.5),   // offset 1, only user 1 active
      (3L, "2024-01-10 10:00:00", 7.0),   // own cohort, offset 0
      (1L, "2024-01-22 10:00:00", 1.0))   // offset 3 (gap at 2)
      .toDF("user_id", "t", "value")
      .withColumn("ts", to_timestamp($"t")).drop("t")
    val got = EventOps.cohortLtv(ev, "user_id", "ts", "value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(got.toSeq === Seq(
      ("2024-01-01", 0L, 2L, 15.0, 15.0, 7.5),
      ("2024-01-01", 1L, 1L, 2.5, 17.5, 8.75),
      ("2024-01-01", 3L, 1L, 1.0, 18.5, 9.25),
      ("2024-01-08", 0L, 1L, 7.0, 7.0, 7.0)), s"${got.toSeq}")
  }

  test("abTestValue: hand-computed Welch t; non-converters count at 0") {
    // variant A (even): users 2,4 exposed; revenues 10 (2x5), 0
    // variant B (odd): users 1,3,5 exposed; revenues 6, 0, 0
    val rows = Seq(
      (2L, "view", 0.0), (2L, "purchase", 5.0), (2L, "purchase", 5.0),
      (4L, "view", 0.0),
      (1L, "view", 0.0), (1L, "purchase", 6.0),
      (3L, "view", 0.0), (5L, "view", 0.0),
      (7L, "purchase", 99.0)) // never exposed -> excluded
      .toDF("user_id", "event_type", "value")
    val r = EventOps.abTestValue(rows, "user_id", "event_type",
      "view", "purchase", "value").collect().head
    assert((r.getLong(0), r.getLong(1)) === ((2L, 3L)))
    assert(r.getDouble(2) === 5.0 && r.getDouble(3) === 2.0)
    // var_a = (100 - 100/2)/1 = 50; var_b = (36 - 36/3)/2 = 12
    assert(r.getDouble(4) === 50.0 && r.getDouble(5) === 12.0)
    val t = (5.0 - 2.0) / math.sqrt(50.0 / 2 + 12.0 / 3)
    assert(r.getDouble(6) === t, s"t=${r.getDouble(6)} want $t")
  }

  test("abTest: zero-margin table (no conversions) reports chi2 0") {
    val ev = Seq((2L, "view"), (3L, "view")).toDF("user_id", "event_type")
    val r = EventOps.abTest(ev, "user_id", "event_type",
      "view", "purchase").collect().head
    assert(r.getDouble(6) === 0.0 && r.getDouble(4) === 0.0)
  }

  test("stickiness: dau/mau per day with a trailing window; " +
      "zero-activity days inside the window report dau = 0") {
    import spark.implicits._
    def ts(d: String) = Timestamp.valueOf(s"2024-01-0$d 12:00:00")
    // u1: day1+day2, u2: day1, u3: day4; window 3 days
    val ev = Seq((1L, ts("1")), (2L, ts("1")), (1L, ts("2")),
      (3L, ts("4"))).toDF("user_id", "ts")
    val r = EventOps.stickiness(ev, "user_id", "ts", mauWindow = 3)
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getDouble(3)))).toMap
    assert(r("2024-01-01") === ((2L, 2L, 1.0)))
    assert(r("2024-01-02") === ((1L, 2L, 0.5)))
    assert(r("2024-01-03") === ((0L, 2L, 0.0)), "silent day: dau 0")
    assert(r("2024-01-04") === ((1L, 2L, 0.5)), "u1@d2 and u3@d4 in window")
    assert(r.size == 4)
  }

  test("interarrivalGaps: per-(type, user) lag in exact micros; first " +
      "event of each series excluded; ties ordered by the tie column") {
    import spark.implicits._
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    def plus(sec: Int) = new Timestamp(t0.getTime + sec * 1000L)
    val ev = Seq(
      (1L, 10L, t0, "v"), (2L, 10L, plus(10), "v"), (3L, 10L, plus(25), "v"),
      (4L, 10L, t0, "c"), // other type: its own series
      (5L, 20L, plus(7), "v")) // other user: no gap
      .toDF("event_id", "user_id", "ts", "event_type")
    val r = EventOps.interarrivalGaps(ev, "user_id", "ts", "event_type",
        "event_id")
      .collect().map(x => (x.getString(0), x.getLong(1)))
    assert(r.sorted === Seq(("v", 10000000L), ("v", 15000000L)))
  }

  test("seasonality: dow 0 is Sunday cross-engine; shares sum to 1 " +
      "per type") {
    import spark.implicits._
    val ev = Seq(
      (Timestamp.valueOf("2024-01-07 10:00:00"), "view"), // Sunday
      (Timestamp.valueOf("2024-01-08 10:00:00"), "view"), // Monday
      (Timestamp.valueOf("2024-01-08 11:00:00"), "view"),
      (Timestamp.valueOf("2024-01-13 11:00:00"), "click")) // Saturday
      .toDF("ts", "event_type")
    val r = EventOps.seasonality(ev, "ts", "event_type").collect()
    val m = r.map(x => (x.getLong(0), x.getString(1)) ->
      ((x.getLong(2), x.getDouble(3)))).toMap
    assert(m((0L, "view")) === ((1L, 1.0 / 3.0)))
    assert(m((1L, "view")) === ((2L, 2.0 / 3.0)))
    assert(m((6L, "click")) === ((1L, 1.0)))
  }

  test("userFeatures: RANGE frames count calendar days (an inactive " +
      "gap does NOT slide extra rows in) and days_since_prev is exact") {
    import spark.implicits._
    def ts(d: String) = Timestamp.valueOf(s"2024-01-$d 12:00:00")
    // user 1: days 1 (2 events), 2, 10 - day 10's 7d window excludes 1-2
    val ev = Seq((1L, ts("01")), (1L, ts("01")), (1L, ts("02")),
      (1L, ts("10"))).toDF("user_id", "ts")
    val r = EventOps.userFeatures(ev, "user_id", "ts")
      .collect().map(x => x.getString(1) ->
        ((x.getLong(2), x.getLong(3), x.getLong(4),
          if (x.isNullAt(5)) -1L else x.getLong(5)))).toMap
    assert(r("2024-01-01") === ((2L, 2L, 2L, -1L)))
    assert(r("2024-01-02") === ((1L, 3L, 3L, 1L)))
    assert(r("2024-01-10") === ((1L, 1L, 4L, 8L)),
      "7d window [Jan 4..10] holds only day 10; 28d holds all")
  }

  test("seasonalNaiveBacktest: gap-filled zeros forecast and are " +
      "forecast; MAE is the exact integer error over the holdout") {
    import spark.implicits._
    def ts(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 12:00:00")
    // type v: 2 events on day 1, none on day 2, 1 on day 8, none 3-9
    // season 7, holdout 2 -> test days 8 (fc = day1 = 2) and 9 (fc =
    // day2 = 0, actual 0)
    val ev = (Seq(ts(1), ts(1), ts(8)).map(("v", _)) :+ (("c", ts(9))))
      .toDF("event_type", "ts")
    val r = EventOps.seasonalNaiveBacktest(ev, "ts", "event_type",
        season = 7, holdout = 2)
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4),
          x.getDouble(5)))).toMap
    // v: day8 |1-2|=1, day9 |0-0|=0 -> abs_err 1, mae 0.5
    assert(r("v") === ((2L, 1L, 2L, 1L, 0.5)))
    // c: day8 |0-2? no - c has day1 count 0 (gap-filled), day8 fc=0,
    // actual 0; day9 actual 1, fc = day2 = 0 -> abs_err 1
    assert(r("c") === ((2L, 1L, 0L, 1L, 0.5)))
  }

  test("backtestServe: daily-count partials written under two batch " +
      "ids merge to the exact batch backtest") {
    import spark.implicits._
    def ts(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 12:00:00")
    val ev = (Seq(ts(1), ts(1), ts(8)).map(("v", _)) :+ (("c", ts(9))))
      .toDF("event_type", "ts").withColumn("event_id",
        monotonically_increasing_id())
    val path = java.nio.file.Files
      .createTempDirectory("graft_forecast_partials").toString
    IncrementalAgg.writeBatch(EventOps.dailyTypeCounts(
      ev.filter(col("event_id") % 2 === 0), "ts", "event_type"), path, 0L)
    IncrementalAgg.writeBatch(EventOps.dailyTypeCounts(
      ev.filter(col("event_id") % 2 =!= 0), "ts", "event_type"), path, 1L)
    val served = EventOps.backtestServe(spark, path, season = 7,
      holdout = 2).collect().map(r => r.getString(0) -> r).toMap
    val batch = EventOps.seasonalNaiveBacktest(ev, "ts", "event_type",
      season = 7, holdout = 2).collect().map(r => r.getString(0) -> r).toMap
    assert(served.keySet === batch.keySet)
    served.keySet.foreach { k =>
      assert(served(k).toSeq === batch(k).toSeq, s"type $k diverged")
    }
  }

  test("firstTouchAttribution vs lastTouch: acquisition and closing " +
      "channels differ when the journey crosses channels") {
    import spark.implicits._
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    def plus(sec: Int) = new Timestamp(t0.getTime + sec * 1000L)
    val ev = Seq(
      (1L, 10L, t0, "view", 0.0), (2L, 10L, plus(10), "click", 0.0),
      (3L, 10L, plus(20), "purchase", 5.0),
      (4L, 20L, t0, "purchase", 7.0)) // no prior touch: (direct)
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    def run(f: (org.apache.spark.sql.DataFrame, String, String, String,
        String, Seq[String], String, String) =>
        org.apache.spark.sql.DataFrame) =
      f(ev, "user_id", "ts", "event_type", "event_id",
        Seq("click", "view"), "purchase", "value")
        .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    val firstT = run(EventOps.firstTouchAttribution)
    val lastT = run(EventOps.lastTouchAttribution)
    assert(firstT === Map("view" -> 1L, "(direct)" -> 1L))
    assert(lastT === Map("click" -> 1L, "(direct)" -> 1L))
  }
}
