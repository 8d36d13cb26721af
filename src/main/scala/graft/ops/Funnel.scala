package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generic N-stage sequential funnel over an event stream — "users whose
  * stage-1 event precedes a stage-2 event that precedes stage 3 …", the
  * ordering constraint that separates a funnel from N independent
  * counts.
  *
  * Plan shape: ONE hash exchange on the user key total, independent of
  * the number of stages. Events relevant to any stage are collected and
  * sorted per user (`groupBy(user).agg(sort_array(collect_list))` — the
  * per-user event list is the bounded session-history unit every
  * product-analytics store shards by), and the whole N-stage match runs
  * INSIDE the row as one left fold over the sorted list. The
  * join-per-stage formulation this replaces plans one co-partitioned
  * join per stage — fine at 3 stages, 8 exchanges at 8 — where this
  * operator is one exchange at any N.
  *
  * Match semantics (the greedy earliest-match chain, provably maximal
  * for subsequence matching): stage i+1 matches the earliest event of
  * its type STRICTLY after the matched stage-i event; equal timestamps
  * do not advance the funnel. Stages may repeat ("view → click → view").
  */
object Funnel {

  /** Per-user funnel depth: (user, depth) where depth ∈ [0, N] is the
    * number of stages matched in order. Users with no relevant events
    * at all are absent (they'd be depth 0 everywhere — callers count
    * depth ≥ i, so absence is exact).
    */
  def userDepths(events: DataFrame, userCol: String, tsCol: String,
                 stageCol: String, stages: Seq[String],
                 maxGapSeconds: Option[Long] = None): DataFrame = {
    require(stages.nonEmpty, "at least one funnel stage")
    val relevant = events
      .filter(col(stageCol).isin(stages: _*))
      .select(col(userCol), col(tsCol).as("__ts"), col(stageCol).as("__st"))
    val tsType = relevant.schema("__ts").dataType
    // struct sorts lexicographically: (ts, stage) — deterministic under
    // equal timestamps, and the strict-> rule makes the fold's result
    // independent of tie order anyway (an equal-ts event can never
    // advance past another matched at the same instant)
    val sorted = relevant.groupBy(col(userCol))
      .agg(array_sort(collect_list(struct(col("__ts").as("ts"),
        col("__st").as("st")))).as("__evs"))
    // the greedy sequential match as a left fold: acc = (depth, ts of
    // the last matched stage); an event advances the funnel iff it is
    // the next expected stage AND strictly later than the last match
    // (and, with a conversion window, within maxGap of it — the
    // "convert within N days" product-analytics contract; NOTE the
    // windowed chain is still greedy-earliest, which can differ from
    // the best achievable depth when skipping an early match would
    // leave more window budget — the same greedy semantics every
    // funnel product documents)
    val stageArr = typedlit(stages)
    // try_element_at: once the funnel is complete (d = N) the next-stage
    // lookup is out of bounds — NULL comparison, never a hit, fold coasts
    val advance = (acc: Column, x: Column) => {
      // window check in exact integer MICROSECONDS (unix_micros), so the
      // oracle's epoch_us comparison is the same arithmetic — a cast to
      // whole seconds would truncate sub-second gaps engine-visibly
      val inWindow = maxGapSeconds match {
        case None => lit(true)
        case Some(g) =>
          acc.getField("last").isNull ||
            unix_micros(x.getField("ts")) -
              unix_micros(acc.getField("last")) <= g * 1000000L
      }
      val hit = try_element_at(stageArr, acc.getField("d") + 1) === x.getField("st") &&
        (acc.getField("last").isNull || x.getField("ts") > acc.getField("last")) &&
        inWindow
      when(hit, struct((acc.getField("d") + 1).as("d"),
        x.getField("ts").as("last"))).otherwise(acc)
    }
    sorted.select(col(userCol),
      aggregate(col("__evs"),
        struct(lit(0).as("d"), lit(null).cast(tsType).as("last")),
        advance, _.getField("d")).as("depth"))
  }

  /** The funnel report: one row per stage — (stage_idx, stage, n_users
    * reaching that stage in order). The per-stage counts are ONE
    * conditional-aggregation pass over [[userDepths]] (the
    * [[Profile.expect]] idiom: N stages = N `sum(CASE)` in one 1-row
    * aggregate), exploded to long format — so the whole operator is the
    * user-key exchange plus a 1-row final aggregate at any N.
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             stageCol: String, stages: Seq[String],
             maxGapSeconds: Option[Long] = None): DataFrame = {
    val depths = userDepths(events, userCol, tsCol, stageCol, stages,
      maxGapSeconds)
    val aggs = stages.zipWithIndex.map { case (_, i) =>
      coalesce(sum(when(col("depth") >= i + 1, 1L).otherwise(0L)), lit(0L))
        .as(s"__n_$i")
    }
    val agged = depths.agg(aggs.head, aggs.tail: _*)
    val entries = stages.zipWithIndex.map { case (stg, i) =>
      struct(lit(i + 1).as("stage_idx"), lit(stg).as("stage"),
        col(s"__n_$i").as("n_users"))
    }
    agged.select(explode(array(entries: _*)).as("r"))
      .select(col("r.stage_idx"), col("r.stage"), col("r.n_users"))
  }
}
