package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{Dedup, EventOps, Graphs, Profile, Similarity}

/** Round-9 session-6, batch 2: degree assortativity, weekday
  * seasonality, cosine range search (exact + IVF-gated), the k-NN
  * classifier eval, and the streaming quantile sketch.
  */
object R23Queries {

  val all: Seq[Q] = Seq(

    Q("graph_assortativity",
      "Degree assortativity (Newman 2002) of the near-dup graph: the " +
        "Pearson correlation of endpoint degrees over the symmetric " +
        "edge list - positive = dense template families pair " +
        "internally, negative = hub-and-spoke canonical-doc structure. " +
        "Every moment accumulates exactly (DECIMAL(38,0) from staged " +
        "DECIMAL(18,0) degrees; HUGEINT in the oracle), and the " +
        "Pearson assembly is ONE fixed double expression - two " +
        "correctly-rounded sqrts, one division. One degree count, two " +
        "node-keyed joins, one 6-cell map-side-combined aggregate.",
      (s, d) => Graphs.assortativity(
        Dedup.minhashCandidates(Tables.documents(s, d), "doc_id", "text",
          Dedup.Shingler.words(5), bandsN = 2, rowsPerBand = 3),
        "id_a", "id_b"),
      Some(s"""WITH ${R14Queries.edgeCtes},
              |deg AS (SELECT src AS id, count(*) AS d FROM edges
              |        GROUP BY src),
              |ed AS (
              |  SELECT dx.d AS x, dy.d AS y
              |  FROM edges e JOIN deg dx ON dx.id = e.src
              |       JOIN deg dy ON dy.id = e.dst),
              |m AS (
              |  SELECT count(*) AS l,
              |    sum(x::HUGEINT) AS sx, sum(y::HUGEINT) AS sy,
              |    sum(x::HUGEINT * y::HUGEINT) AS sxy,
              |    sum(x::HUGEINT * x::HUGEINT) AS sxx,
              |    sum(y::HUGEINT * y::HUGEINT) AS syy
              |  FROM ed),
              |nn AS (SELECT count(*) AS n_nodes FROM deg)
              |SELECT nn.n_nodes, m.l // 2 AS m_edges,
              |  CASE WHEN (m.l::HUGEINT * sxx - sx * sx) > 0
              |        AND (m.l::HUGEINT * syy - sy * sy) > 0
              |    THEN CAST(m.l::HUGEINT * sxy - sx * sy AS DOUBLE) /
              |      (sqrt(CAST(m.l::HUGEINT * sxx - sx * sx AS DOUBLE)) *
              |       sqrt(CAST(m.l::HUGEINT * syy - sy * sy AS DOUBLE)))
              |    ELSE NULL END AS assortativity
              |FROM m, nn""".stripMargin)),

    Q("ev_seasonality",
      "Day-of-week seasonality per event type: volume and within-type " +
        "share for each weekday (0 = Sunday) - the weekly-cycle " +
        "readout ev_anomaly's flat EWMA baseline misses. One map-side " +
        "combined (dow, type) aggregate (<= 7*|types| rows) + a " +
        "broadcast totals join; the share is one division of two " +
        "exact longs per cell.",
      (s, d) => EventOps.seasonality(Tables.events(s, d),
        "ts", "event_type"),
      Some("""WITH c AS (
             |  SELECT dayofweek(ts) AS dow, event_type, count(*) AS n
             |  FROM events GROUP BY 1, 2),
             |t AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS tot
             |      FROM c GROUP BY 1)
             |SELECT c.dow, c.event_type, c.n,
             |  CAST(c.n AS DOUBLE) / CAST(t.tot AS DOUBLE) AS share
             |FROM c JOIN t USING (event_type)
             |ORDER BY c.dow, c.event_type""".stripMargin)),

    Q("sim_range",
      "Exact cosine RANGE search - every vector within 0.2 of the " +
        "stored query, not a fixed top-k: the retrieval mode dedup " +
        "thresholds need where k is unknowable up front. One narrow " +
        "scan-stage cosine per row + a pushed filter. The gated " +
        "surface is MEMBERSHIP (ids), not the raw cosine: Spark's " +
        "double->decimal cast rounds through a 34-significant-digit " +
        "context where DuckDB rounds the exact binary value, so raw " +
        "cosines can differ by 1e-14 on boundary products - membership " +
        "at 0.2 is safe by 4e-4 on every fixture (measured), the same " +
        "stance the top-k family takes on cosine ties.",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val q = Similarity.vectorOf(emb, "vec_id", "embedding", 0L)
        Similarity.rangeSearch(emb, "vec_id", "embedding", q, 0.2)
          .select("vec_id").orderBy("vec_id")
      },
      Some(s"""WITH q AS (SELECT embedding AS qe FROM embeddings
              |           WHERE vec_id = 0),
              |nq AS (
              |  SELECT sqrt(${R14Queries.dotSql("qe", "qe")}) AS nrm
              |  FROM q, generate_series(1, 64) g(i)),
              |ne AS (
              |  SELECT vec_id,
              |    sqrt(${R14Queries.dotSql("embedding", "embedding")}) AS nrm
              |  FROM embeddings, generate_series(1, 64) g(i)
              |  GROUP BY vec_id),
              |dots AS (
              |  SELECT e.vec_id,
              |    ${R14Queries.dotSql("e.embedding", "q.qe")} AS dot
              |  FROM embeddings e, q, generate_series(1, 64) g(i)
              |  GROUP BY e.vec_id)
              |SELECT d.vec_id
              |FROM dots d JOIN ne ON d.vec_id = ne.vec_id, nq
              |WHERE d.dot / (ne.nrm * nq.nrm) >= 0.2
              |ORDER BY d.vec_id""".stripMargin)),

    Q("sim_range_ivf",
      "Range search through the IVF index, gated: probe only the top-3 " +
        "clusters (the 100 TB path - the scan prunes to nprobe " +
        "partitions), threshold inside them, and report per " +
        "brute-force-true row whether the pruned probe found it plus " +
        "the recall fraction - the range-query analogue of the top-k " +
        "recall gates. An in-bound miss is the tuning signal; a broken " +
        "probe fails the round. Gated on membership + recall (exact " +
        "integers, one division), not raw cosines - the sim_range " +
        "decimal-cast-drift stance.",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val q = Similarity.vectorOf(emb, "vec_id", "embedding", 0L)
        Similarity.rangeSearchIvfGate(emb, "vec_id", "embedding", "label",
          q, minCos = 0.2, nprobe = 3)
          .select("vec_id", "found", "recall").orderBy("vec_id")
      },
      Some(s"""WITH q AS (SELECT embedding AS qe FROM embeddings
              |           WHERE vec_id = 0),
              |nq AS (
              |  SELECT sqrt(${R14Queries.dotSql("qe", "qe")}) AS nrm
              |  FROM q, generate_series(1, 64) g(i)),
              |ne AS MATERIALIZED (
              |  SELECT vec_id,
              |    sqrt(${R14Queries.dotSql("embedding", "embedding")}) AS nrm
              |  FROM embeddings, generate_series(1, 64) g(i)
              |  GROUP BY vec_id),
              |dots AS MATERIALIZED (
              |  SELECT e.vec_id,
              |    ${R14Queries.dotSql("e.embedding", "q.qe")} AS dot
              |  FROM embeddings e, q, generate_series(1, 64) g(i)
              |  GROUP BY e.vec_id),
              |truth AS MATERIALIZED (
              |  SELECT d.vec_id, d.dot / (ne.nrm * nq.nrm) AS cos_sim
              |  FROM dots d JOIN ne ON d.vec_id = ne.vec_id, nq
              |  WHERE d.dot / (ne.nrm * nq.nrm) >= 0.2),
              |cent AS (
              |  SELECT label, i,
              |    cast(sum(cast(embedding[i]::DOUBLE AS DECIMAL(38,14)))
              |      AS DOUBLE) / count(*) AS c
              |  FROM embeddings, generate_series(1, 64) g(i)
              |  GROUP BY label, i),
              |cdot AS (
              |  SELECT c.label,
              |    cast(sum(cast(c.c * q.qe[c.i]::DOUBLE AS DECIMAL(38,14)))
              |      AS DOUBLE) AS dot,
              |    sqrt(cast(sum(cast(c.c * c.c AS DECIMAL(38,14)))
              |      AS DOUBLE)) AS cn
              |  FROM cent c, q GROUP BY c.label),
              |probe AS (
              |  SELECT label FROM cdot, nq
              |  ORDER BY dot / (cn * nq.nrm) DESC, label LIMIT 3),
              |found AS (
              |  SELECT t.vec_id FROM truth t
              |  JOIN embeddings e ON e.vec_id = t.vec_id
              |  JOIN probe p ON p.label = e.label),
              |summary AS (
              |  SELECT count(*) AS n,
              |    (SELECT count(*) FROM found) AS f FROM truth)
              |SELECT t.vec_id,
              |  f.vec_id IS NOT NULL AS found,
              |  CAST(s.f AS DOUBLE) / CAST(s.n AS DOUBLE) AS recall
              |FROM truth t LEFT JOIN found f ON f.vec_id = t.vec_id
              |CROSS JOIN summary s
              |ORDER BY t.vec_id""".stripMargin)),

    Q("ml_knn",
      "Leave-one-out k-NN classifier eval over a 50-anchor sample - " +
        "does the embedding space separate the labels before anyone " +
        "trusts it for blocking or curation. Same plan discipline as " +
        "sim_hardneg: anchors broadcast, ONE corpus scan scores all " +
        "of them, per-anchor top-(k+1) through the TopKAgg partial " +
        "aggregate, self excluded after ranking (ties at cosine 1.0 " +
        "order by id), plurality vote with smallest-label tie-break - " +
        "all integer. Never an all-pairs join.",
      (s, d) => Similarity.knnClassify(Tables.embeddings(s, d),
        "vec_id", "embedding", "label",
        anchorIds = (0L to 490L by 10).toSeq, k = 5),
      Some {
        val dot = R14Queries.dotSql _
        s"""WITH anchors AS (
           |  SELECT vec_id AS aid, embedding AS ae, label AS albl
           |  FROM embeddings WHERE vec_id % 10 = 0 AND vec_id <= 490),
           |na AS (
           |  SELECT aid, greatest(sqrt(${dot("ae", "ae")}), 1e-30) AS nrm
           |  FROM anchors, generate_series(1, 64) g(i) GROUP BY aid),
           |ne AS (
           |  SELECT vec_id,
           |    greatest(sqrt(${dot("embedding", "embedding")}), 1e-30)
           |      AS nrm
           |  FROM embeddings, generate_series(1, 64) g(i)
           |  GROUP BY vec_id),
           |dots AS (
           |  SELECT a.aid, e.vec_id, ${dot("e.embedding", "a.ae")} AS dot
           |  FROM embeddings e CROSS JOIN anchors a,
           |       generate_series(1, 64) g(i)
           |  GROUP BY a.aid, e.vec_id),
           |ranked AS (
           |  SELECT d.aid, d.vec_id,
           |    row_number() OVER (PARTITION BY d.aid
           |      ORDER BY d.dot / (ne.nrm * na.nrm) DESC, d.vec_id)
           |      AS rank
           |  FROM dots d JOIN ne ON d.vec_id = ne.vec_id
           |       JOIN na ON d.aid = na.aid),
           |nbrs AS (
           |  SELECT aid, vec_id FROM ranked
           |  WHERE rank <= 6 AND vec_id <> aid
           |  QUALIFY row_number() OVER (PARTITION BY aid ORDER BY rank)
           |    <= 5),
           |votes AS (
           |  SELECT n.aid, l.label AS nlbl, count(*) AS votes
           |  FROM nbrs n JOIN embeddings l ON l.vec_id = n.vec_id
           |  GROUP BY n.aid, l.label),
           |pred AS (
           |  SELECT aid, nlbl AS predicted, votes FROM (
           |    SELECT aid, nlbl, votes,
           |      row_number() OVER (PARTITION BY aid
           |        ORDER BY votes DESC, nlbl) AS rn
           |    FROM votes) WHERE rn = 1)
           |SELECT p.aid AS anchor_id, a.albl AS true_label,
           |  p.predicted, p.votes, p.predicted = a.albl AS correct
           |FROM pred p JOIN anchors a ON a.aid = p.aid
           |ORDER BY anchor_id""".stripMargin
      }),

    Q("stream_quantiles",
      "Structured Streaming maintains the QUANTILE SKETCH: the " +
        "historical half of events bootstraps batch 0's equi-width " +
        "histogram partial under a FROZEN (lo, hi, 256) geometry (the " +
        "profiling-pass analogue of frozen quantizers), each " +
        "micro-batch appends its own <= 256-row count partial, and " +
        "serving locates each quantile's bin from the merged counts - " +
        "identical to the batch histogram because counts merge by " +
        "addition. Gated against the exact order statistics: exact " +
        "values hash-check cross-engine, within_bin bounds the sketch " +
        "error to one bin width.",
      (s, d) => {
        val ev = Tables.events(s, d)
        val b = ev.agg(min(col("value")), max(col("value"))).head()
        val (lo, hi) = (b.getDouble(0), b.getDouble(1))
        val path = graft.streaming.EventStream.runQuantilesStream(s, d,
          sys.props.getOrElse("java.io.tmpdir", "/tmp") +
            "/graft_stream_quant_" + d.replaceAll("[^A-Za-z0-9.]", "_"),
          lo, hi, 256)
        Profile.quantileSketchServe(s, path, ev, "value",
          Seq(0.5, 0.9, 0.99), lo, hi, 256)
      },
      Some("""WITH v AS (
             |  SELECT value::DOUBLE AS v FROM events
             |  WHERE value IS NOT NULL),
             |st AS (SELECT count(*) AS n, min(v) AS lo, max(v) AS hi
             |       FROM v),
             |h AS (
             |  SELECT CAST(greatest(least(floor((v - lo) /
             |    ((hi - lo) / 256.0)), 255), 0) AS INT) AS b,
             |    count(*) AS c
             |  FROM v, st GROUP BY 1),
             |qs(q) AS (VALUES (0.5::DOUBLE), (0.9::DOUBLE),
             |                 (0.99::DOUBLE)),
             |cumh AS (SELECT b, sum(c) OVER (ORDER BY b) AS cum FROM h),
             |loc AS (
             |  SELECT qs.q, min(cumh.b) AS bin
             |  FROM qs, st, cumh
             |  WHERE cumh.cum >=
             |    greatest(CAST(ceil(qs.q * st.n) AS BIGINT), 1)
             |  GROUP BY qs.q),
             |r AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM v),
             |ex AS (
             |  SELECT qs.q,
             |    (SELECT r.v FROM r, st
             |     WHERE rn = greatest(CAST(ceil(qs.q * st.n) AS BIGINT),
             |                         1)) AS exact
             |  FROM qs)
             |SELECT ex.q, ex.exact,
             |  st.lo + loc.bin * ((st.hi - st.lo) / 256.0) AS est_sketch,
             |  abs(ex.exact -
             |    (st.lo + loc.bin * ((st.hi - st.lo) / 256.0)))
             |    <= ((st.hi - st.lo) / 256.0) AS within_bin
             |FROM ex JOIN loc ON loc.q = ex.q, st
             |ORDER BY ex.q""".stripMargin)))
}
