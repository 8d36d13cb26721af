package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.Dedup
import graft.plans.AsOfJoin

/** Round-2 additions: custom whole-operator seams (as-of join) and the
  * dedup/streaming depth on top of round 1's inventory.
  */
object R2Queries {

  val all: Seq[Q] = Seq(

    Q("q20_asof_join",
      "As-of (temporal) join via the custom Catalyst operator " +
        "(AsOfJoinPlan → AsOfJoinStrategy → AsOfJoinExec): for each " +
        "purchase event, the latest prior-or-equal view by the same user. " +
        "Plans as a co-partitioned sort-merge with one O(n+m) forward " +
        "pass — no pair blow-up. Oracle: DuckDB's native ASOF LEFT JOIN.",
      (s, d) => {
        val ev = Tables.events(s, d)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("p_us"), col("value").as("p_value"))
        val views = ev.filter(col("event_type") === "view")
          .select(col("user_id").as("v_user"),
            unix_micros(col("ts")).as("v_us"), col("value").as("v_value"))
        AsOfJoin.asof(purchases, views,
            leftOn = Seq("user_id"), rightOn = Seq("v_user"),
            leftTimeCol = "p_us", rightTimeCol = "v_us")
          .select("user_id", "event_id", "p_us", "p_value", "v_us", "v_value")
          .orderBy("user_id", "p_us", "event_id")
      },
      Some("""WITH p AS (SELECT user_id, event_id, epoch_us(ts) AS p_us,
             |                  value AS p_value
             |           FROM events WHERE event_type = 'purchase'),
             |     v AS (SELECT user_id AS v_user, epoch_us(ts) AS v_us,
             |                  value AS v_value
             |           FROM events WHERE event_type = 'view')
             |SELECT p.user_id, p.event_id, p.p_us, p.p_value, v.v_us, v.v_value
             |FROM p ASOF LEFT JOIN v
             |  ON p.user_id = v.v_user AND v.v_us <= p.p_us
             |ORDER BY p.user_id, p.p_us, p.event_id""".stripMargin)),

    Q("dedup_cluster",
      "The dedup endgame: MinHash-LSH candidate pairs → connected " +
        "components (iterative min-label propagation, one join+agg per " +
        "round, rounds = component diameter) → min-id survivor per " +
        "cluster. Oracle: DuckDB recursive CTE over the same edge list.",
      (s, d) => {
        val pairs = Dedup.minhashCandidates(Tables.documents(s, d),
          "doc_id", "text", Dedup.Shingler.words(5), bandsN = 2, rowsPerBand = 3)
        val cc = Dedup.connectedComponents(pairs, "id_a", "id_b")
        val w = Window.partitionBy("cluster")
        cc.select(col("id"), col("label").as("cluster"))
          .withColumn("cluster_size", count(lit(1)).over(w))
          .withColumn("is_survivor", col("id") === col("cluster"))
          .orderBy("id")
      },
      Some(
        s"""WITH RECURSIVE ${ExtQueries.minhashBandCtes},
           |pairs AS (
           |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
           |  FROM bands a JOIN bands b
           |    ON a.band = b.band AND a.h = b.h AND a.doc_id < b.doc_id
           |  GROUP BY 1, 2),
           |edges AS (
           |  SELECT id_a AS src, id_b AS dst FROM pairs
           |  UNION SELECT id_b, id_a FROM pairs),
           |reach AS (
           |  SELECT src AS id, src AS lab FROM edges
           |  UNION
           |  SELECT e.dst AS id, r.lab FROM reach r JOIN edges e ON e.src = r.id),
           |cc AS (SELECT id, min(lab) AS cluster FROM reach GROUP BY id)
           |SELECT id, cluster,
           |       count(*) OVER (PARTITION BY cluster) AS cluster_size,
           |       id = cluster AS is_survivor
           |FROM cc ORDER BY id""".stripMargin)),

    Q("stream_sessionize",
      "Sessionization as a REAL Structured Streaming query: readStream → " +
        "watermark → session_window agg → append-mode memory sink, driven " +
        "to completion with a watermark-flush row (bounded state, " +
        "emit-once — the production shape). Oracle: the same lag+cumsum " +
        "SQL as batch ev_sessionize — stream ≡ batch.",
      (s, d) => graft.streaming.EventStream.runSessionStream(s, d)
        .orderBy("user_id", "session_start_us"),
      Some("""WITH g AS (
             |  SELECT user_id, epoch_us(ts) AS us, value,
             |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
             |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
             |         THEN 1 ELSE 0 END AS new_sess
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |sess AS (
             |  SELECT user_id, us, value,
             |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY us
             |      ROWS UNBOUNDED PRECEDING) AS session_id
             |  FROM g)
             |SELECT user_id, min(us) AS session_start_us, count(*) AS n_events,
             |       max(us) - min(us) AS duration_us,
             |       cast(sum(cast(value AS DECIMAL(28,8))) AS DOUBLE) AS sum_value
             |FROM sess
             |GROUP BY user_id, session_id
             |ORDER BY user_id, session_start_us""".stripMargin)))
}
