package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, Long, String, String)*) =
    rows.toDF("event_id", "user_id", "t", "event_type")
      .withColumn("ts", col("t").cast("timestamp")).drop("t")

  private def depths(e: org.apache.spark.sql.DataFrame,
                     stages: Seq[String], gap: Option[Long]) =
    Funnel.userDepths(e, "user_id", "ts", "event_type", stages, gap)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("conversion window: a stage landing past the gap does not advance") {
    val e = ev(
      (1L, 1L, "2024-01-01 00:00:00", "signup"),
      (2L, 1L, "2024-01-01 00:30:00", "view"),     // inside 1h window
      (3L, 1L, "2024-01-01 03:00:00", "purchase"), // 2.5h after view: out
      (4L, 2L, "2024-01-01 00:00:00", "signup"),
      (5L, 2L, "2024-01-01 02:00:00", "view"))     // 2h after signup: out
    val stages = Seq("signup", "view", "purchase")
    val d = depths(e, stages, Some(3600L))
    assert(d === Map(1L -> 2, 2L -> 1))
    // without the window both users go further
    val d2 = depths(e, stages, None)
    assert(d2 === Map(1L -> 3, 2L -> 2))
  }

  test("window boundary is inclusive and measured in exact microseconds") {
    val e = ev(
      (1L, 1L, "2024-01-01 00:00:00", "signup"),
      (2L, 1L, "2024-01-01 01:00:00", "view"))      // exactly 3600s
    assert(depths(e, Seq("signup", "view"), Some(3600L)) === Map(1L -> 2))
    val e2 = ev(
      (1L, 1L, "2024-01-01 00:00:00.000000", "signup"),
      (2L, 1L, "2024-01-01 01:00:00.000001", "view")) // 1 µs over
    assert(depths(e2, Seq("signup", "view"), Some(3600L)) === Map(1L -> 1))
  }

  test("window counts from the previous MATCH, not the funnel start") {
    val e = ev(
      (1L, 1L, "2024-01-01 00:00:00", "signup"),
      (2L, 1L, "2024-01-01 00:50:00", "view"),
      (3L, 1L, "2024-01-01 01:30:00", "purchase")) // 40min after view
    assert(depths(e, Seq("signup", "view", "purchase"), Some(3600L)) ===
      Map(1L -> 3))
  }

  test("userStageTimes: greedy-earliest matched timestamps, length = " +
      "depth, decoys skipped") {
    val e = ev(
      (1L, 1L, "2024-01-01 00:00:05", "view"),     // later view: not first
      (2L, 1L, "2024-01-01 00:00:01", "view"),     // earliest view matches
      (3L, 1L, "2024-01-01 00:00:00", "click"),    // click BEFORE view: decoy
      (4L, 1L, "2024-01-01 00:00:03", "click"),    // first valid click
      (5L, 1L, "2024-01-01 00:00:09", "purchase"),
      (6L, 2L, "2024-01-01 00:00:01", "view"))     // depth 1 user
    val stages = Seq("view", "click", "purchase")
    val times = Funnel.userStageTimes(e, "user_id", "ts", "event_type", stages)
      .collect().map(r => r.getLong(0) ->
        r.getSeq[java.sql.Timestamp](1).map(_.toString)).toMap
    assert(times(1L) == Seq("2024-01-01 00:00:01.0",
      "2024-01-01 00:00:03.0", "2024-01-01 00:00:09.0"))
    assert(times(2L) == Seq("2024-01-01 00:00:01.0"))
    val d = depths(e, stages, None)
    assert(times.forall { case (u, ts) => ts.size == d(u) },
      "times length must equal funnel depth")
  }

  test("funnelTiming: per-transition gaps, mean and median exact on " +
      "the fixture") {
    val e = ev(
      (1L, 1L, "2024-01-01 00:00:00", "view"),
      (2L, 1L, "2024-01-01 00:00:10", "click"),    // gap 10s
      (3L, 1L, "2024-01-01 00:01:10", "purchase"), // gap 60s
      (4L, 2L, "2024-01-01 00:00:00", "view"),
      (5L, 2L, "2024-01-01 00:00:30", "click"),    // gap 30s
      (6L, 3L, "2024-01-01 00:00:00", "view"))     // never converts
    val g = Funnel.funnelTiming(e, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(g(1) == ((2L, 20.0, 20.0)), s"view->click: $g") // mean(10,30), median interp
    assert(g(2) == ((1L, 60.0, 60.0)), s"click->purchase: $g")
  }
}
