package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

class StatefulSessionsSpec extends SparkSpec {
  import StatefulSessions._

  // offset the timeline off epoch zero: a row with ts == initial
  // watermark (0) is dropped as late
  private val Base = 1440L
  private def ts(minute: Long): Timestamp = new Timestamp((Base + minute) * 60000L)
  private def us(minute: Long): Long = (Base + minute) * 60000000L

  test("flatMapGroupsWithState sessionization: gap splits, state flush on watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Ev]
    val sessions = sessionize(input.toDS(), gapMinutes = 30,
      watermarkDelay = "0 seconds")
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("graft_sessions").start()
    try {
      // user 1: two sessions (gap 45min); user 2: one session
      input.addData(
        Ev(1L, ts(0), 1.0), Ev(1L, ts(10), 2.0),
        Ev(1L, ts(55), 4.0), Ev(1L, ts(60), 8.0),
        Ev(2L, ts(5), 16.0))
      q.processAllAvailable()
      // a far-future event pushes the watermark past every open timeout
      input.addData(Ev(99L, ts(10000), 0.0))
      q.processAllAvailable()
      // one more batch so timed-out state from the previous watermark fires
      input.addData(Ev(99L, ts(10001), 0.0))
      q.processAllAvailable()

      val got = spark.table("graft_sessions")
        .as[Session].collect().filter(_.user_id != 99L)
        .sortBy(s => (s.user_id, s.session_start_us)).toSeq
      val minUs = 60000000L // µs per minute
      assert(got == Seq(
        Session(1L, us(0), 2L, 10 * minUs, 3.0),
        Session(1L, us(55), 2L, 5 * minUs, 12.0),
        Session(2L, us(5), 1L, 0L, 16.0)))
    } finally q.stop()
  }

  test("gap of exactly 30 minutes EXTENDS the session (session_window merges inclusively)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // Empirical pin of the boundary convention: Spark's session_window
    // merges a window starting at t with one ending at t, so an event
    // exactly `gap` after the previous belongs to the SAME session.
    // StatefulSessions (`delta <= gap`) and the lag+cumsum oracle
    // (new-session iff `delta > gap`) must both follow suit.
    val input = MemoryStream[Ev]
    val sessions = sessionize(input.toDS(), gapMinutes = 30,
      watermarkDelay = "0 seconds")
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("graft_sessions_edge").start()
    try {
      // deltas: 29min (same session), then exactly 30min (still same),
      // then 31min (new session)
      input.addData(Ev(1L, ts(0), 1.0), Ev(1L, ts(29), 2.0),
        Ev(1L, ts(59), 4.0), Ev(1L, ts(90), 8.0))
      q.processAllAvailable()
      input.addData(Ev(99L, ts(10000), 0.0))
      q.processAllAvailable()
      input.addData(Ev(99L, ts(10001), 0.0))
      q.processAllAvailable()

      val got = spark.table("graft_sessions_edge")
        .as[Session].collect().filter(_.user_id == 1L)
        .sortBy(_.session_start_us).toSeq
      val minUs = 60000000L
      assert(got == Seq(
        Session(1L, us(0), 3L, 59 * minUs, 7.0),
        Session(1L, us(90), 1L, 0L, 8.0)))

      // and the built-in session_window agrees on the same fixture
      val batch = Seq(Ev(1L, ts(0), 1.0), Ev(1L, ts(29), 2.0),
        Ev(1L, ts(59), 4.0), Ev(1L, ts(90), 8.0)).toDS()
      import org.apache.spark.sql.functions._
      val viaOp = batch
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n"))
        .select("user_id", "n").as[(Long, Long)]
        .collect().sortBy(_._2).toSeq
      assert(viaOp == Seq((1L, 1L), (1L, 3L)))
    } finally q.stop()
  }
}
