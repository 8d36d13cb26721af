package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.{Dedup, EventOps}
import graft.streaming.EventStream

/** Round-8 session, part 4: the EXACT set-similarity join (prefix
  * filtering — the zero-false-negative complement to MinHash), session
  * path mining and audience-overlap reports over the event stream, and
  * the funnel as an INCREMENTAL streaming state machine checked against
  * the batch oracle.
  */
object R12Queries {

  /** DuckDB restatement of the distinct word-3-gram shingle LIST (not
    * unnested) — [[ExtQueries.wordShingleSqlPub]]'s shape, kept as a
    * list so the brute-force oracle can intersect whole sets.
    */
  private def shingleListSql(c: String, n: Int): String =
    ExtQueries.wordShingleSqlPub(c, n)

  private val funnelStages =
    Seq("signup", "view", "click", "view", "purchase")

  def all: Seq[Q] = Seq(

    Q("dedup_ppjoin",
      "EXACT Jaccard >= 0.5 near-dup pairs via prefix filtering " +
        "(AllPairs/PPJoin, Bayardo et al. WWW'07): shingles ordered " +
        "globally by ascending df, each doc joins only on its first " +
        "n - ceil(theta*n) + 1 shingles (provably complete), the size " +
        "filter theta*|b| <= |a| <= |b|/theta rides the join condition, " +
        "and only candidate pairs reach the exact verify. The oracle is " +
        "the INDEPENDENT brute-force all-pairs intersection - so the " +
        "prefix filter's zero-false-negative claim is itself " +
        "hash-checked, not assumed.",
      (s, d) => Dedup.ppjoinPairs(Tables.documents(s, d), "doc_id", "text",
          Dedup.Shingler.words(3), threshold = 0.5)
        .orderBy("id_a", "id_b"),
      Some(s"""WITH sh AS (
              |  SELECT doc_id AS id, ${shingleListSql("text", 3)} AS ts
              |  FROM documents),
              |pairs AS (
              |  SELECT a.id AS id_a, b.id AS id_b,
              |         len(list_intersect(a.ts, b.ts)) AS n_common,
              |         len(a.ts) + len(b.ts)
              |           - len(list_intersect(a.ts, b.ts)) AS n_union
              |  FROM sh a JOIN sh b ON a.id < b.id)
              |SELECT id_a, id_b, n_common,
              |       n_common::DOUBLE / n_union AS jaccard
              |FROM pairs WHERE n_common::DOUBLE / n_union >= 0.5
              |ORDER BY id_a, id_b""".stripMargin)),

    Q("ev_paths",
      "Top-20 session PATHS: gap-sessionize (30 min), join each " +
        "session's event types in (ts, event_id) order into a " +
        "'view>click>purchase' string, count across sessions, top-k by " +
        "(frequency, path) - the what-do-users-actually-do report next " +
        "to the funnel's do-they-do-THIS. One session_window exchange, " +
        "in-row path assembly, map-side-combined path counts, " +
        "TakeOrderedAndProject for the top-k; the oracle restates " +
        "sessionization as lag + cumulative sum and the path as an " +
        "ordered string_agg.",
      (s, d) => EventOps.sessionPaths(Tables.events(s, d),
        "user_id", "ts", "event_type", "event_id"),
      Some("""WITH g AS (
             |  SELECT user_id, epoch_us(ts) AS us, event_id, event_type,
             |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
             |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
             |         THEN 1 ELSE 0 END AS new_sess
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |sess AS (
             |  SELECT user_id, us, event_id, event_type,
             |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
             |      ROWS UNBOUNDED PRECEDING) AS session_id
             |  FROM g),
             |paths AS (
             |  SELECT user_id, session_id,
             |    string_agg(event_type, '>' ORDER BY us, event_id) AS path
             |  FROM sess GROUP BY 1, 2)
             |SELECT path, count(*) AS n_sessions FROM paths
             |GROUP BY 1 ORDER BY n_sessions DESC, path LIMIT 20""".stripMargin)),

    Q("ev_overlap",
      "Engaged-audience overlap matrix: segments are users with >= 15 " +
        "events of a type; every segment pair reports both sizes, the " +
        "intersection, and Jaccard affinity. One map-side-combinable " +
        "(user, type) aggregate, a user-co-partitioned self-join with " +
        "per-user fanout bounded by |types|^2, output bounded by the " +
        "type vocabulary - nothing user-sized crosses a second exchange.",
      (s, d) => EventOps.segmentOverlap(Tables.events(s, d),
          "user_id", "event_type", minEvents = 15L)
        .orderBy("type_a", "type_b"),
      Some("""WITH ut AS (
             |  SELECT user_id AS u, event_type AS t FROM events
             |  GROUP BY 1, 2 HAVING count(*) >= 15),
             |sizes AS (SELECT t, count(*) AS n FROM ut GROUP BY t),
             |ovl AS (
             |  SELECT a.t AS type_a, b.t AS type_b, count(*) AS n_both
             |  FROM ut a JOIN ut b ON a.u = b.u AND a.t < b.t
             |  GROUP BY 1, 2)
             |SELECT type_a, type_b, na.n AS n_a, nb.n AS n_b, n_both,
             |  n_both::DOUBLE / (na.n + nb.n - n_both) AS jaccard
             |FROM ovl JOIN sizes na ON na.t = type_a
             |         JOIN sizes nb ON nb.t = type_b
             |ORDER BY type_a, type_b""".stripMargin)),

    Q("stream_funnel",
      "The five-stage funnel maintained INCREMENTALLY by a " +
        "flatMapGroupsWithState state machine (two fields per user: " +
        "depth + last-matched micros, bounded at any stream length), " +
        "fed in three event-time-ordered micro-batches and checked " +
        "against the SAME min-ts join-chain oracle as the batch " +
        "ev_funnel_n: stream == batch.",
      (s, d) => EventStream.runFunnelStream(s, d, funnelStages)
        .orderBy("stage_idx"),
      Some(R9Queries.all.find(_.name == "ev_funnel_n").get.oracle.get)))
}
