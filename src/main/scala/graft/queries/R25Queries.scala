package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{Dedup, EntityResolution, EventOps, Profile}

/** Round-9 session-6, batch 4: golden-record survivorship, the
  * user-feature matrix, the dedup duplication report, and the feed
  * freshness audit.
  */
object R25Queries {

  val all: Seq[Q] = Seq(

    Q("er_golden",
      "Golden-record survivorship after entity resolution - the MDM " +
        "merge step: each er_cluster elects one canonical record by " +
        "the deterministic preference clean-source first, longest " +
        "name, lexicographically/id-greatest (a single struct-max, " +
        "the dedup_survivor argmax pattern - no per-cluster sort), " +
        "with membership counts beside it. One id-keyed attrs join + " +
        "one cluster-keyed aggregate; clusters-sized output.",
      (s, d) => EntityResolution.golden(
        R10Queries.dirtyCustomers(s, d).withColumnRenamed("id", "dirty_id"),
        "dirty_id",
        R10Queries.cleanCustomers(s, d).withColumnRenamed("id", "clean_id"),
        "clean_id", "name"),
      Some(s"""WITH RECURSIVE ${R10Queries.erSourceCtes},
              |${R10Queries.erPairCtes},
              |${R10Queries.erClusterCtes},
              |attrs AS (
              |  SELECT id, name, TRUE AS ic FROM clean
              |  UNION ALL SELECT id, name, FALSE FROM dirty),
              |m AS (
              |  SELECT l.cluster, a.id, a.name, a.ic
              |  FROM lab l JOIN attrs a USING (id)),
              |pick AS (
              |  SELECT cluster, id AS golden_id, name AS golden_name
              |  FROM (
              |    SELECT cluster, id, name,
              |      row_number() OVER (PARTITION BY cluster
              |        ORDER BY ic DESC, length(name) DESC, name DESC,
              |                 id DESC) AS rn
              |    FROM m) WHERE rn = 1)
              |SELECT m.cluster, count(*) AS n_members,
              |  CAST(sum(CASE WHEN m.ic THEN 1 ELSE 0 END) AS BIGINT)
              |    AS n_clean,
              |  any_value(p.golden_id) AS golden_id,
              |  any_value(p.golden_name) AS golden_name
              |FROM m JOIN pick p ON p.cluster = m.cluster
              |GROUP BY m.cluster ORDER BY m.cluster""".stripMargin)),

    Q("ev_features",
      "Per-(user, active day) trailing-window feature matrix - the " +
        "feature-store rows a churn/propensity model trains on: " +
        "today's count, trailing 7d/28d counts, days since previous " +
        "activity. One (user, day) aggregate (the only event-sized " +
        "exchange), then two integer RANGE frames on the epoch-day " +
        "index (RANGE, not ROWS - inactive days must not slide in) " +
        "and one lag over the SAME user-keyed sort. All exact " +
        "integers.",
      (s, d) => EventOps.userFeatures(Tables.events(s, d),
        "user_id", "ts"),
      Some("""WITH daily AS (
             |  SELECT user_id, ts::DATE AS day, count(*) AS n_day
             |  FROM events GROUP BY 1, 2),
             |di AS (
             |  SELECT user_id, day, n_day,
             |    CAST(day - DATE '1970-01-01' AS BIGINT) AS d
             |  FROM daily)
             |SELECT user_id, strftime(day, '%Y-%m-%d') AS day, n_day,
             |  CAST(sum(n_day) OVER (PARTITION BY user_id ORDER BY d
             |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
             |    AS n_7d,
             |  CAST(sum(n_day) OVER (PARTITION BY user_id ORDER BY d
             |    RANGE BETWEEN 27 PRECEDING AND CURRENT ROW) AS BIGINT)
             |    AS n_28d,
             |  d - lag(d) OVER (PARTITION BY user_id ORDER BY d)
             |    AS days_since_prev
             |FROM di ORDER BY user_id, day""".stripMargin)),

    Q("dedup_stats",
      "Duplication REPORT over the near-dup clusters - the one-page " +
        "summary a curation run logs: cluster-size histogram (how " +
        "many families of each size, how many docs they absorb) over " +
        "the connected components of the MinHash candidate graph. " +
        "Two tiny aggregates past the CC labels; singleton docs " +
        "(no candidate edges) are outside the graph by construction.",
      (s, d) => {
        val cc = Dedup.connectedComponents(
          Dedup.minhashCandidates(Tables.documents(s, d), "doc_id",
            "text", Dedup.Shingler.words(5), bandsN = 2, rowsPerBand = 3),
          "id_a", "id_b")
        cc.groupBy(col("label")).agg(count(lit(1)).as("__sz"))
          .groupBy(col("__sz").as("cluster_size"))
          .agg(count(lit(1)).as("n_clusters"))
          .select(col("cluster_size"), col("n_clusters"),
            (col("cluster_size") * col("n_clusters")).as("n_docs"))
          .orderBy(col("cluster_size"))
      },
      Some(s"""WITH RECURSIVE ${ExtQueries.minhashPairCtes},
              |edges AS (
              |  SELECT id_a AS src, id_b AS dst FROM pairs
              |  UNION SELECT id_b, id_a FROM pairs),
              |reach AS (
              |  SELECT src AS id, src AS lab FROM edges
              |  UNION
              |  SELECT e.dst AS id, r.lab FROM reach r
              |  JOIN edges e ON e.src = r.id),
              |cc AS (SELECT id, min(lab) AS cluster FROM reach GROUP BY id),
              |sizes AS (SELECT cluster, count(*) AS sz FROM cc GROUP BY 1)
              |SELECT sz AS cluster_size, count(*) AS n_clusters,
              |  CAST(sz * count(*) AS BIGINT) AS n_docs
              |FROM sizes GROUP BY sz ORDER BY cluster_size""".stripMargin)),

    Q("dq_freshness",
      "Feed freshness per event type - the ingest-health audit read " +
        "before anything downstream trusts a slice: last event time, " +
        "staleness behind the global watermark in exact micros, row " +
        "count, trailing-24h/7d volume relative to that watermark. " +
        "One keyed conditional-sum aggregate + a broadcast 1-row " +
        "global max; everything integer.",
      (s, d) => Profile.freshness(Tables.events(s, d),
        "event_type", "ts"),
      Some("""WITH g AS (SELECT max(epoch_us(ts)) AS gmax FROM events
             |           WHERE ts IS NOT NULL)
             |SELECT event_type AS key, count(*) AS n_rows,
             |  max(epoch_us(ts)) AS last_us,
             |  g.gmax - max(epoch_us(ts)) AS staleness_us,
             |  CAST(sum(CASE WHEN epoch_us(ts) > g.gmax - 86400000000
             |    THEN 1 ELSE 0 END) AS BIGINT) AS n_last_1d,
             |  CAST(sum(CASE WHEN epoch_us(ts) > g.gmax - 604800000000
             |    THEN 1 ELSE 0 END) AS BIGINT) AS n_last_7d
             |FROM events, g WHERE ts IS NOT NULL
             |GROUP BY event_type, g.gmax
             |ORDER BY key NULLS LAST""".stripMargin)))
}
