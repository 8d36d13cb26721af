package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state streaming: gap-based sessionization via
  * `flatMapGroupsWithState` (the KeyValueGroupedDataset seam for state
  * machines the built-in windows can't express — per-key custom state,
  * event-time timeouts).
  *
  * Semantics match EventStream's session_window / the lag+cumsum oracle.
  * Boundary convention (pinned by StatefulSessionsSpec's edge test): an
  * event arriving EXACTLY `gapMinutes` after the previous one EXTENDS the
  * session — Spark's session_window merges a window starting at t with a
  * window ending at t (inclusive merge), so same-session is `delta <= gap`
  * and the lag+cumsum oracle's new-session test is strict `>`.
  * A closed session is emitted either when a later event proves the gap,
  * or when the event-time watermark passes the session's timeout (no
  * more on-time events can extend it).
  *
  * State per key is one open session (4 longs + a double) — bounded
  * regardless of stream length; the watermark timeout guarantees state
  * for idle keys is eventually emitted and dropped. That bounded-state
  * argument is the whole point of the pattern at 100 TB/day event rates.
  */
object StatefulSessions {

  case class Ev(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class OpenSession(startUs: Long, lastUs: Long, n: Long, sum: Double)
  case class Session(user_id: Long, session_start_us: Long, n_events: Long,
                     duration_us: Long, sum_value: Double)

  def sessionize(events: Dataset[Ev], gapMinutes: Int = 30,
                 watermarkDelay: String = "10 minutes"): Dataset[Session] = {
    implicit val evEnc = Encoders.product[Ev]
    implicit val stEnc = Encoders.product[OpenSession]
    implicit val outEnc = Encoders.product[Session]
    implicit val keyEnc = Encoders.scalaLong
    val gapUs = gapMinutes * 60L * 1000000L

    def emit(user: Long, s: OpenSession): Session =
      Session(user, s.startUs, s.n, s.lastUs - s.startUs, s.sum)

    def update(user: Long, batch: Iterator[Ev],
               state: GroupState[OpenSession]): Iterator[Session] = {
      if (batch.isEmpty && state.hasTimedOut) {
        // watermark passed the gap: no on-time event can extend it
        val closed = state.getOption.map(emit(user, _)).iterator
        state.remove()
        return closed
      }
      val evs = batch.toSeq.sortBy(e => (e.ts.getTime, e.value))
      var open = state.getOption
      val closed = Seq.newBuilder[Session]
      evs.foreach { e =>
        val us = e.ts.getTime * 1000L
        open match {
          case Some(s) if us - s.lastUs <= gapUs =>
            open = Some(s.copy(lastUs = math.max(s.lastUs, us), n = s.n + 1,
              sum = s.sum + e.value))
          case Some(s) =>
            closed += emit(user, s)
            open = Some(OpenSession(us, us, 1, e.value))
          case None =>
            open = Some(OpenSession(us, us, 1, e.value))
        }
      }
      open.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.lastUs / 1000L + gapMinutes * 60L * 1000L)
      }
      closed.result().iterator
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }
}
