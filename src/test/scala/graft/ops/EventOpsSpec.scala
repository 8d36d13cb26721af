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
}
