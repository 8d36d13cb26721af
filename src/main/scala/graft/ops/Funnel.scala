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

  /** Per-user matched-stage TIMESTAMPS: (user, times array) where
    * times(i) is when the greedy earliest-match chain reached stage
    * i+1 (array length = the user's depth). Same single user-key
    * exchange and in-row fold as [[userDepths]], with the accumulator
    * carrying the matched-time list (≤ |stages| entries — bounded row
    * state); times(i) equals the min-ts chain recurrence's i-th value
    * by the same greedy-earliest argument the funnel property test
    * pins. This is the input to conversion-TIMING analytics: stage
    * gaps, time-to-convert distributions.
    */
  def userStageTimes(events: DataFrame, userCol: String, tsCol: String,
                     stageCol: String, stages: Seq[String],
                     maxGapSeconds: Option[Long] = None): DataFrame = {
    require(stages.nonEmpty, "at least one funnel stage")
    val relevant = events
      .filter(col(stageCol).isin(stages: _*))
      .select(col(userCol), col(tsCol).as("__ts"), col(stageCol).as("__st"))
    val tsType = relevant.schema("__ts").dataType
    val sorted = relevant.groupBy(col(userCol))
      .agg(array_sort(collect_list(struct(col("__ts").as("ts"),
        col("__st").as("st")))).as("__evs"))
    val stageArr = typedlit(stages)
    val advance = (acc: Column, x: Column) => {
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
        x.getField("ts").as("last"),
        concat(acc.getField("times"), array(x.getField("ts"))).as("times")))
        .otherwise(acc)
    }
    sorted.select(col(userCol),
      aggregate(col("__evs"),
        struct(lit(0).as("d"), lit(null).cast(tsType).as("last"),
          array().cast(org.apache.spark.sql.types.ArrayType(tsType))
            .as("times")),
        advance, _.getField("times")).as("times"))
  }

  /** Conversion-TIMING report: one row per adjacent stage transition —
    * (from_idx, stage_from, stage_to, n_converted, mean_gap_s,
    * p50_gap_s) over the users whose greedy chain reached the later
    * stage. Gaps are exact integer MICROSECONDS from
    * [[userStageTimes]] (the funnel family's no-float-drift
    * discipline); the mean divides an exact decimal-staged sum, and
    * the median interpolates on integers (percentile ≡ quantile_cont —
    * the one interpolation both engines define identically). Plan: the
    * one user-key exchange, a bounded per-user explode (≤ |stages|−1
    * rows), one aggregate.
    */
  def funnelTiming(events: DataFrame, userCol: String, tsCol: String,
                   stageCol: String, stages: Seq[String],
                   maxGapSeconds: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val times = userStageTimes(events, userCol, tsCol, stageCol, stages,
      maxGapSeconds)
    val trans = (1 until stages.size).map { i =>
      struct(lit(i).as("from_idx"),
        lit(stages(i - 1)).as("stage_from"), lit(stages(i)).as("stage_to"),
        (unix_micros(try_element_at(col("times"), lit(i + 1))) -
          unix_micros(try_element_at(col("times"), lit(i)))).as("gap_us"))
    }
    times.select(explode(array(trans: _*)).as("t"))
      .select(col("t.from_idx"), col("t.stage_from"), col("t.stage_to"),
        col("t.gap_us"))
      .filter(col("gap_us").isNotNull)
      .groupBy(col("from_idx"), col("stage_from"), col("stage_to"))
      .agg(count(lit(1)).as("n_converted"),
        (sum(col("gap_us").cast(DecimalType(38, 0))).cast("double") /
          count(lit(1)) / lit(1000000.0)).as("mean_gap_s"),
        (expr("percentile(gap_us, 0.5)") / lit(1000000.0)).as("p50_gap_s"))
      .orderBy(col("from_idx"))
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
             maxGapSeconds: Option[Long] = None): DataFrame =
    depthCounts(userDepths(events, userCol, tsCol, stageCol, stages,
      maxGapSeconds), stages)

  /** The depth → per-stage-counts step of [[funnel]], separated so any
    * producer of (user, depth) rows — the batch fold above, the
    * incremental streaming state machine
    * ([[graft.streaming.StatefulFunnel]]) — shares the one
    * conditional-aggregation report.
    */
  def depthCounts(depths: DataFrame, stages: Seq[String],
                  depthCol: String = "depth"): DataFrame = {
    val aggs = stages.zipWithIndex.map { case (_, i) =>
      coalesce(sum(when(col(depthCol) >= i + 1, 1L).otherwise(0L)), lit(0L))
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
