package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state streaming FUNNEL: the greedy earliest-match N-stage chain
  * of [[graft.ops.Funnel]] as a `flatMapGroupsWithState` state machine —
  * the per-user funnel position maintained INCREMENTALLY as events
  * arrive, instead of re-folding history per query.
  *
  * Semantics are pinned to the batch operator: stage i+1 matches the
  * earliest event of its type STRICTLY after the matched stage-i event
  * (equal timestamps never advance), stages may repeat, ties inside a
  * micro-batch sort by (event-time micros, stage string) — exactly the
  * batch fold's `array_sort(struct(ts, st))` order. Given micro-batches
  * that arrive in event-time order per user (equal timestamps never
  * split across batches), the incremental fold is the batch fold by
  * associativity of "resume the greedy chain from (depth, last-match)".
  *
  * State per key is TWO fields — (depth, last-matched micros) — bounded
  * regardless of stream length or stage count: the 100 TB/day argument.
  * Emission is one (user, depth) row per updated key per batch; depth is
  * monotone non-decreasing, so downstream takes max(depth) per user.
  */
object StatefulFunnel {

  case class Ev(user_id: Long, ts: java.sql.Timestamp, event_type: String)
  case class FunnelState(depth: Int, lastUs: Long) // lastUs = Long.MinValue until stage 1 matches
  case class DepthRow(user_id: Long, depth: Int)

  /** Exact event-time micros (Timestamp.getTime is millis; the
    * sub-millisecond rest lives in getNanos) — the batch fold compares
    * unix_micros, so the streaming fold must too.
    */
  private def micros(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  def depths(events: Dataset[Ev], stages: Seq[String]): Dataset[DepthRow] = {
    require(stages.nonEmpty, "at least one funnel stage")
    implicit val evEnc = Encoders.product[Ev]
    implicit val stEnc = Encoders.product[FunnelState]
    implicit val outEnc = Encoders.product[DepthRow]
    implicit val keyEnc = Encoders.scalaLong
    val stageSet = stages.toSet

    def update(user: Long, batch: Iterator[Ev],
               state: GroupState[FunnelState]): Iterator[DepthRow] = {
      val evs = batch.filter(e => stageSet(e.event_type)).toSeq
        .sortBy(e => (micros(e.ts), e.event_type))
      if (evs.isEmpty) return Iterator.empty
      var st = state.getOption.getOrElse(FunnelState(0, Long.MinValue))
      evs.foreach { e =>
        val us = micros(e.ts)
        if (st.depth < stages.length && stages(st.depth) == e.event_type &&
            (st.depth == 0 || us > st.lastUs))
          st = FunnelState(st.depth + 1, us)
      }
      state.update(st)
      Iterator.single(DepthRow(user, st.depth))
    }

    events
      .filter(e => stageSet(e.event_type))
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update)
  }
}
