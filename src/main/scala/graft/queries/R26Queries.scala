package graft.queries

import graft.core.Tables
import graft.ops.{EntityResolution, EventOps}

/** Round-9 session-6, batch 5: the seasonal-naive forecast backtest and
  * the ER blocking-quality report.
  */
object R26Queries {

  val all: Seq[Q] = Seq(

    Q("ev_forecast",
      "Seasonal-naive forecast backtest per event type - the honest " +
        "baseline every volume forecast must beat: daily counts " +
        "gap-filled to the global day grid (a missing day is a real " +
        "zero - without the fill a ROWS-lag silently skips it), each " +
        "of the last 7 days forecast as the count 7 days earlier, MAE " +
        "/ bias / totals reported. Error sums are exact integers; MAE " +
        "and bias are one division each. One (type, day) aggregate + " +
        "a broadcast day grid + one lag window.",
      (s, d) => EventOps.seasonalNaiveBacktest(Tables.events(s, d),
        "ts", "event_type", season = 7, holdout = 7),
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

    Q("er_metrics",
      "Blocking-quality report for the deletion-neighborhood entity " +
        "resolution - the numbers that justify the blocking before " +
        "anyone trusts it at scale: record counts, the quadratic pair " +
        "space avoided (DECIMAL(38,0) - 1e9 x 1e9 sets don't " +
        "overflow), candidates generated, verified matches, matched " +
        "left records, reduction ratio and match rate. One aggregate " +
        "per relation, 1-row frames broadcast-crossed; the ratios are " +
        "the only doubles.",
      (s, d) => EntityResolution.blockingMetrics(
        R10Queries.dirtyCustomers(s, d).withColumnRenamed("id", "dirty_id"),
        "dirty_id",
        R10Queries.cleanCustomers(s, d).withColumnRenamed("id", "clean_id"),
        "clean_id", "name"),
      Some(s"""WITH ${R10Queries.erSourceCtes},
              |${R10Queries.erPairCtes},
              |nl AS (SELECT count(*) AS n_left FROM dirty),
              |nr AS (SELECT count(*) AS n_right FROM clean),
              |nc AS (SELECT count(*) AS n_candidates FROM cand),
              |nv AS (SELECT count(*) AS n_verified FROM ver),
              |nm AS (SELECT count(DISTINCT dirty_id) AS n_matched
              |       FROM ver)
              |SELECT n_left, n_right,
              |  CAST(CAST(n_left AS DECIMAL(38,0)) *
              |       CAST(n_right AS DECIMAL(38,0)) AS VARCHAR)
              |    AS n_possible,
              |  n_candidates, n_verified, n_matched,
              |  1.0 - CAST(n_candidates AS DOUBLE) /
              |    CAST(CAST(n_left AS DECIMAL(38,0)) *
              |         CAST(n_right AS DECIMAL(38,0)) AS DOUBLE)
              |    AS reduction_ratio,
              |  CAST(n_matched AS DOUBLE) / CAST(n_left AS DOUBLE)
              |    AS match_rate
              |FROM nl, nr, nc, nv, nm""".stripMargin)))
}
