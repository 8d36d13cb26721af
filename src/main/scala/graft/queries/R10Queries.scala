package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.EventOps

/** Round-8 session, part 2: the event-sequence analytics family beyond
  * funnel/retention — next-event transition matrix, last-touch
  * attribution, dense gap-fill — plus the new operator families added
  * this round (binary ANN, entity resolution, incremental aggregates,
  * length-bucketed batching) registered in their own files.
  */
object R10Queries {

  val all: Seq[Q] = Seq(

    Q("ev_transitions",
      "Markov next-event transition matrix: adjacent event pairs per " +
        "user (ordered by (ts, event_id) so equal timestamps are " +
        "deterministic), counted into the |types| x |types| matrix with " +
        "per-source transition probabilities — the navigation-flow / " +
        "behavioral-model input. ONE user-keyed exchange for the lead " +
        "window; the (from, to) aggregate map-side-combines every " +
        "partition to <= 25 rows before the second (trivial) exchange; " +
        "the probability normalization is a window over the bounded " +
        "matrix itself.",
      (s, d) => EventOps.transitions(Tables.events(s, d),
        "user_id", "ts", "event_type", "event_id"),
      Some("""WITH seq AS (
             |  SELECT event_type AS from_type,
             |    lead(event_type) OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id) AS to_type
             |  FROM events),
             |tc AS (
             |  SELECT from_type, to_type, count(*) AS n
             |  FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2)
             |SELECT from_type, to_type, n,
             |  cast(n AS DOUBLE) /
             |    cast(sum(n) OVER (PARTITION BY from_type) AS DOUBLE) AS p
             |FROM tc
             |ORDER BY from_type, to_type""".stripMargin)),

    Q("ev_attribution",
      "Last-touch conversion attribution: every purchase credits the " +
        "most recent strictly-preceding touch event (click/view/signup) " +
        "of its user, or the '(direct)' sentinel when none precedes it; " +
        "revenue sums through exact decimal so channel totals are " +
        "order-independent. The carry-forward is last(..ignoreNulls) " +
        "over a user-keyed frame ending at the PREVIOUS row — strict " +
        "precedence holds even under equal timestamps because only rows " +
        "physically before the conversion (by the (ts, event_id) sort) " +
        "are in frame. One user exchange + a |channels|-row rollup.",
      (s, d) => EventOps.lastTouchAttribution(Tables.events(s, d),
        "user_id", "ts", "event_type", "event_id",
        touchTypes = Seq("click", "view", "signup"),
        conversionType = "purchase", valueCol = "value"),
      Some("""WITH attr AS (
             |  SELECT event_type, value,
             |    coalesce(last_value(CASE WHEN event_type IN
             |        ('click', 'view', 'signup') THEN event_type END
             |        IGNORE NULLS)
             |      OVER (PARTITION BY user_id ORDER BY ts, event_id
             |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             |      '(direct)') AS channel
             |  FROM events)
             |SELECT channel, count(*) AS n_conversions,
             |  cast(sum(cast(value AS DECIMAL(28,8))) AS DOUBLE) AS revenue
             |FROM attr
             |WHERE event_type = 'purchase'
             |GROUP BY channel
             |ORDER BY channel""".stripMargin)),

    Q("ev_gapfill",
      "Dense daily time series for a bounded watchlist (users with " +
        "user_id % 50 = 1): purchase counts per (user, day) over the " +
        "full observation window, ZERO-FILLED on empty days, with " +
        "last-observation-carried-forward daily revenue — the gap-fill " +
        "+ LOCF pass every dashboard and feature-store export needs. " +
        "The day spine is a 1-row min/max aggregate exploded and " +
        "broadcast; the users x days grid is bounded by construction; " +
        "the sparse facts aggregate once on (user, day) and left-join " +
        "the grid; LOCF is a window over the bounded grid.",
      (s, d) => {
        val ev = Tables.events(s, d)
        val sel = ev.filter(col("user_id") % 50 === 1 &&
          col("event_type") === "purchase")
        EventOps.gapFillDaily(sel, ev, "user_id", "ts", "value")
      },
      Some("""WITH bounds AS (
             |  SELECT min(ts::DATE) AS d0, max(ts::DATE) AS d1 FROM events),
             |days AS (
             |  SELECT unnest(generate_series(d0::TIMESTAMP, d1::TIMESTAMP,
             |    INTERVAL 1 DAY))::DATE AS day
             |  FROM bounds),
             |sel AS (
             |  SELECT * FROM events
             |  WHERE user_id % 50 = 1 AND event_type = 'purchase'),
             |users AS (SELECT DISTINCT user_id FROM sel),
             |daily AS (
             |  SELECT user_id, ts::DATE AS day, count(*) AS n,
             |    cast(sum(cast(value AS DECIMAL(28,8))) AS DOUBLE) AS rev
             |  FROM sel GROUP BY 1, 2),
             |grid AS (
             |  SELECT u.user_id, d.day FROM users u CROSS JOIN days d)
             |SELECT g.user_id, strftime(g.day, '%Y-%m-%d') AS day,
             |  coalesce(dy.n, 0) AS n_events,
             |  coalesce(last_value(dy.rev IGNORE NULLS)
             |    OVER (PARTITION BY g.user_id ORDER BY g.day
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             |    0.0::DOUBLE) AS rev_locf
             |FROM grid g
             |LEFT JOIN daily dy ON dy.user_id = g.user_id AND dy.day = g.day
             |ORDER BY g.user_id, g.day""".stripMargin))
  )
}
