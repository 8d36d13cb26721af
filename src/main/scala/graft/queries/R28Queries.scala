package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.EventOps
import graft.plans.AsOfJoin

/** Round-9 session-6, batch 7: the streaming-maintained forecast
  * backtest and the tolerance-bounded as-of join.
  */
object R28Queries {

  val all: Seq[Q] = Seq(

    Q("stream_forecast",
      "Structured Streaming maintains the forecast backtest's daily " +
        "counts: the historical half of events bootstraps batch 0's " +
        "(type, day) count partial, each micro-batch appends its own " +
        "(counts merge by addition), and serving merges committed " +
        "partials before the SAME backtestFromDaily tail as the batch " +
        "operator - so the streaming-maintained backtest scores the " +
        "identical forecast, checked by ev_forecast's oracle verbatim. " +
        "Per-refresh cost: one narrow aggregate of the new files.",
      (s, d) => {
        val path = graft.streaming.EventStream.runForecastStream(s, d,
          sys.props.getOrElse("java.io.tmpdir", "/tmp") +
            "/graft_stream_forecast_" + d.replaceAll("[^A-Za-z0-9.]", "_"))
        EventOps.backtestServe(s, path, season = 7, holdout = 7)
      },
      Some("""WITH daily AS (
             |  SELECT event_type, ts::DATE AS day, count(*) AS n
             |  FROM events GROUP BY 1, 2),
             |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
             |grid AS (
             |  SELECT t.event_type,
             |    CAST(unnest(generate_series(b.d0::TIMESTAMP,
             |      b.d1::TIMESTAMP, INTERVAL 1 DAY)) AS DATE) AS day,
             |    CAST(b.d1 - DATE '1970-01-01' AS BIGINT) AS d1i
             |  FROM (SELECT DISTINCT event_type FROM daily) t, b),
             |full0 AS (
             |  SELECT g.event_type,
             |    CAST(g.day - DATE '1970-01-01' AS BIGINT) AS di,
             |    g.d1i, COALESCE(d.n, 0) AS n
             |  FROM grid g LEFT JOIN daily d
             |    ON d.event_type = g.event_type AND d.day = g.day),
             |fc AS (
             |  SELECT event_type, di, d1i, n,
             |    lag(n, 7) OVER (PARTITION BY event_type ORDER BY di)
             |      AS f
             |  FROM full0)
             |SELECT event_type, count(*) AS n_days,
             |  CAST(sum(n) AS BIGINT) AS total_actual,
             |  CAST(sum(f) AS BIGINT) AS total_forecast,
             |  CAST(sum(abs(n - f)) AS BIGINT) AS abs_err,
             |  CAST(sum(abs(n - f)) AS DOUBLE) / CAST(count(*) AS DOUBLE)
             |    AS mae,
             |  CAST(sum(n) - sum(f) AS DOUBLE) / CAST(count(*) AS DOUBLE)
             |    AS bias
             |FROM fc WHERE di > d1i - 7 AND f IS NOT NULL
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    Q("q31_asof_tolerance",
      "As-of join with a MAX-STALENESS tolerance (pandas merge_asof " +
        "tolerance / kdb wj): each purchase joins its latest prior " +
        "view by the same user ONLY if that view is at most 6 hours " +
        "old - staler state comes back NULL instead of leaking into " +
        "the feature row. Because the as-of match is already the " +
        "latest row <= t, tolerance is one projection over the custom " +
        "AsOfJoinExec's exact result - never a second join. Oracle: " +
        "DuckDB's native ASOF LEFT JOIN with the same nulling CASE.",
      (s, d) => {
        val ev = Tables.events(s, d)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("p_us"), col("value").as("p_value"))
        val views = ev.filter(col("event_type") === "view")
          .select(col("user_id").as("v_user"),
            unix_micros(col("ts")).as("v_us"), col("value").as("v_value"))
        AsOfJoin.asofTolerance(purchases, views,
            leftOn = Seq("user_id"), rightOn = Seq("v_user"),
            leftTimeCol = "p_us", rightTimeCol = "v_us",
            tolerance = 6L * 3600L * 1000000L)
          .select("user_id", "event_id", "p_us", "p_value", "v_us",
            "v_value")
          .orderBy("user_id", "p_us", "event_id")
      },
      Some("""WITH p AS (SELECT user_id, event_id, epoch_us(ts) AS p_us,
             |                  value AS p_value
             |           FROM events WHERE event_type = 'purchase'),
             |     v AS (SELECT user_id AS v_user, epoch_us(ts) AS v_us,
             |                  value AS v_value
             |           FROM events WHERE event_type = 'view')
             |SELECT p.user_id, p.event_id, p.p_us, p.p_value,
             |  CASE WHEN v.v_us IS NOT NULL
             |        AND p.p_us - v.v_us <= 21600000000
             |       THEN v.v_us END AS v_us,
             |  CASE WHEN v.v_us IS NOT NULL
             |        AND p.p_us - v.v_us <= 21600000000
             |       THEN v.v_value END AS v_value
             |FROM p ASOF LEFT JOIN v
             |  ON p.user_id = v.v_user AND v.v_us <= p.p_us
             |ORDER BY p.user_id, p.p_us, p.event_id""".stripMargin)))
}
