package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.{Dedup, EventOps, Frequent, Graphs, Profile, Similarity}

/** Round-8 session, part 3: graph structure beyond PageRank (triangle
  * counting / clustering coefficients), the dimensionality-reduction
  * member of the ANN scan family (Rademacher random projection), the
  * sketch-then-exact pair every profiling pass needs at corpus scale
  * (Misra–Gries heavy hitters, histogram-guided exact quantiles), and
  * daily volume anomalies on the event stream.
  */
object R11Queries {

  private def dotSql(a: String, b: String): String = R5Queries.dotSql(a, b)

  val all: Seq[Q] = Seq(

    Q("graph_triangles",
      "Per-vertex triangle counts + local clustering coefficient over " +
        "the near-dup similarity graph — the structural complement to " +
        "graph_pagerank: a dense (high-LCC) neighborhood is a genuine " +
        "duplicate family, a low-LCC hub is boilerplate bridging " +
        "unrelated docs. Degree-oriented wedge join (Suri & " +
        "Vassilvitskii): edges orient from (degree,id)-smaller to " +
        "larger endpoint, so max out-degree is O(sqrt(m)) and a " +
        "high-degree hub contributes no quadratic wedge blowup; the " +
        "closing edge is one semi-join. The oracle counts each " +
        "triangle once by id-ordered enumeration — a different " +
        "formulation, same triangles, which cross-checks the " +
        "orientation logic itself.",
      (s, d) => Graphs.triangles(
        Dedup.minhashCandidates(Tables.documents(s, d), "doc_id", "text",
          Dedup.Shingler.words(5), bandsN = 2, rowsPerBand = 3),
        "id_a", "id_b"),
      Some(
        s"""WITH ${ExtQueries.minhashPairCtes},
           |und AS (
           |  SELECT DISTINCT least(id_a, id_b) AS u,
           |    greatest(id_a, id_b) AS v
           |  FROM pairs WHERE id_a <> id_b),
           |edges AS (SELECT u AS src, v AS dst FROM und
           |          UNION ALL SELECT v, u FROM und),
           |deg AS (SELECT src AS id, count(*) AS degree FROM edges GROUP BY src),
           |tri AS (
           |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
           |  FROM und e1 JOIN und e2 ON e2.u = e1.v
           |       JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v),
           |tv AS (SELECT a AS id FROM tri UNION ALL SELECT b FROM tri
           |       UNION ALL SELECT c FROM tri),
           |tc AS (SELECT id, count(*) AS triangles FROM tv GROUP BY id)
           |SELECT d.id, d.degree,
           |  coalesce(t.triangles, 0) AS triangles,
           |  CASE WHEN d.degree < 2 THEN 0.0
           |       ELSE 2.0 * coalesce(t.triangles, 0) /
           |            (d.degree * (d.degree - 1.0)) END AS lcc
           |FROM deg d LEFT JOIN tc t USING (id)
           |ORDER BY d.id""".stripMargin)),

    Q("sim_randproj",
      "Random-projection ANN (Rademacher/JL, Achlioptas 2003) with " +
        "exact rescoring — the dimensionality-reduction member of the " +
        "scan family (quant shrinks bits/dim, hamming shrinks to one " +
        "bit, this shrinks the NUMBER of dims 64→16): the ±1 sign " +
        "matrix derives from a pure integer formula on (i,j), so " +
        "nothing is trained, stored, or broadcast and appends are " +
        "trivially consistent; projected coordinates sum through the " +
        "repo-wide DECIMAL(38,14) staging so both engines see " +
        "bit-identical vectors; squared-L2 shortlist(50) via " +
        "TakeOrderedAndProject, exact decimal cosine on survivors.",
      (s, d) => Similarity.randProjTopK(Tables.embeddings(s, d),
        "vec_id", "embedding", queryId = 0L, k = 10, rescore = 50),
      Some(
        s"""WITH proj AS (
           |  SELECT vec_id, j,
           |    CAST(sum(CAST(embedding[i]::DOUBLE *
           |      (CASE WHEN ((i * 37 + j * 101) % 97) % 2 = 0
           |            THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END)
           |      AS DECIMAL(38,14))) AS DOUBLE) AS p
           |  FROM embeddings, generate_series(1, 64) g(i),
           |       generate_series(1, 16) h(j)
           |  GROUP BY vec_id, j),
           |pq AS (SELECT j, p FROM proj WHERE vec_id = 0),
           |pd AS (
           |  SELECT a.vec_id,
           |    CAST(sum(CAST((a.p - b.p) * (a.p - b.p)
           |      AS DECIMAL(38,14))) AS DOUBLE) AS approx_dist
           |  FROM proj a JOIN pq b USING (j) GROUP BY a.vec_id),
           |short AS (
           |  SELECT vec_id, approx_dist FROM pd
           |  ORDER BY approx_dist, vec_id LIMIT 50),
           |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
           |nq AS (
           |  SELECT sqrt(${dotSql("qe", "qe")}) AS nrm
           |  FROM q, generate_series(1, 64) g(i)),
           |m AS (
           |  SELECT e.vec_id, e.embedding FROM embeddings e
           |  JOIN short s ON e.vec_id = s.vec_id),
           |ne AS (
           |  SELECT vec_id, sqrt(${dotSql("embedding", "embedding")}) AS nrm
           |  FROM m, generate_series(1, 64) g(i) GROUP BY vec_id),
           |dots AS (
           |  SELECT m.vec_id, ${dotSql("m.embedding", "q.qe")} AS dot
           |  FROM m, q, generate_series(1, 64) g(i) GROUP BY m.vec_id)
           |SELECT d.vec_id, s.approx_dist, d.dot / (ne.nrm * nq.nrm) AS cos_sim
           |FROM dots d JOIN ne ON d.vec_id = ne.vec_id
           |  JOIN short s ON d.vec_id = s.vec_id, nq
           |ORDER BY cos_sim DESC, d.vec_id LIMIT 10""".stripMargin)),

    Q("sim_recall_randproj",
      "Recall@10 gate for the random-projection index: exact brute " +
        "force vs project(16) → L2 shortlist(50) → exact rescore → " +
        "top-10, intersected. A drop here means 16 projected dims " +
        "don't preserve enough of the distance geometry for a 50-row " +
        "rescore budget.",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val q = Similarity.vectorOf(emb, "vec_id", "embedding", 0L)
        val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 10)
        val approx = Similarity.randProjTopK(emb, "vec_id", "embedding",
          queryId = 0L, k = 10, rescore = 50)
        Similarity.recallAtK(exact, approx, "vec_id", 10)
      },
      Some(
        s"""WITH proj AS (
           |  SELECT vec_id, j,
           |    CAST(sum(CAST(embedding[i]::DOUBLE *
           |      (CASE WHEN ((i * 37 + j * 101) % 97) % 2 = 0
           |            THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END)
           |      AS DECIMAL(38,14))) AS DOUBLE) AS p
           |  FROM embeddings, generate_series(1, 64) g(i),
           |       generate_series(1, 16) h(j)
           |  GROUP BY vec_id, j),
           |pq AS (SELECT j, p FROM proj WHERE vec_id = 0),
           |pd AS (
           |  SELECT a.vec_id,
           |    CAST(sum(CAST((a.p - b.p) * (a.p - b.p)
           |      AS DECIMAL(38,14))) AS DOUBLE) AS approx_dist
           |  FROM proj a JOIN pq b USING (j) GROUP BY a.vec_id),
           |short AS (
           |  SELECT vec_id, approx_dist FROM pd
           |  ORDER BY approx_dist, vec_id LIMIT 50),
           |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
           |nq AS (
           |  SELECT sqrt(${dotSql("qe", "qe")}) AS nrm
           |  FROM q, generate_series(1, 64) g(i)),
           |ne AS (
           |  SELECT vec_id, sqrt(${dotSql("embedding", "embedding")}) AS nrm
           |  FROM embeddings, generate_series(1, 64) g(i) GROUP BY vec_id),
           |dots AS (
           |  SELECT e.vec_id, ${dotSql("e.embedding", "q.qe")} AS dot
           |  FROM embeddings e, q, generate_series(1, 64) g(i)
           |  GROUP BY e.vec_id),
           |exact AS (
           |  SELECT d.vec_id FROM dots d JOIN ne USING (vec_id), nq
           |  ORDER BY d.dot / (ne.nrm * nq.nrm) DESC, d.vec_id LIMIT 10),
           |approx AS (
           |  SELECT d.vec_id
           |  FROM dots d JOIN ne USING (vec_id) JOIN short s USING (vec_id), nq
           |  ORDER BY d.dot / (ne.nrm * nq.nrm) DESC, d.vec_id LIMIT 10)
           |SELECT CAST(10 AS BIGINT) AS k,
           |  count(*) AS hits,
           |  CASE WHEN (SELECT count(*) FROM exact) > 0
           |    THEN CAST(count(*) AS DOUBLE) /
           |         (SELECT count(*) FROM exact)
           |    ELSE 0.0 END AS recall
           |FROM approx JOIN exact USING (vec_id)""".stripMargin)),

    Q("ta_heavyhitters",
      "Heavy hitters over the corpus token stream via per-partition " +
        "Misra–Gries summaries (O(k) memory, no shuffle) + exact " +
        "recount of the <=k·P candidates — finds every token with " +
        "frequency > 0.2% WITHOUT shuffling the full vocabulary; the " +
        "k+1 >= 1/threshold bound makes the candidate set provably " +
        "complete, so the recounted output is EXACT and the plain " +
        "GROUP BY/HAVING oracle hash-matches it.",
      (s, d) => Frequent.heavyHitters(
        Frequent.wsTokens(Tables.documents(s, d), "text"),
        "token", threshold = 0.002, k = 1024),
      Some("""WITH toks AS (
             |  SELECT t.tok AS item
             |  FROM documents d,
             |       unnest(string_split_regex(trim(d.text), '\s+')) AS t(tok)
             |  WHERE t.tok <> ''),
             |n AS (SELECT count(*) AS n FROM toks)
             |SELECT item, count(*) AS cnt,
             |  CAST(count(*) AS DOUBLE) / n.n AS share
             |FROM toks, n
             |GROUP BY item, n.n
             |HAVING count(*) > 0.002 * n.n
             |ORDER BY cnt DESC, item""".stripMargin)),

    Q("dq_quantiles",
      "Exact quantiles WITHOUT a global sort: one min/max pass, one " +
        "mergeable 256-bin histogram pass (<=256 rows cross the " +
        "exchange), then the cumulative histogram locates each order " +
        "statistic's bin and a TakeOrdered over just that bin's ~n/256 " +
        "rows reads the exact value. The est column is the sketch-only " +
        "answer (bin lower edge) and within_bin pins |exact-est| to " +
        "one bin width — the oracle recomputes est from the same " +
        "arithmetic, so the sketch geometry itself is hash-checked.",
      (s, d) => Profile.quantilesExact(Tables.events(s, d), "value",
        Seq(0.5, 0.9, 0.99), bins = 256),
      Some("""WITH v AS (
             |  SELECT value::DOUBLE AS v FROM events WHERE value IS NOT NULL),
             |st AS (SELECT count(*) AS n, min(v) AS lo, max(v) AS hi FROM v),
             |qs(q) AS (VALUES (0.5::DOUBLE), (0.9::DOUBLE), (0.99::DOUBLE)),
             |r AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM v),
             |ex AS (
             |  SELECT q,
             |    (SELECT r.v FROM r, st
             |     WHERE rn = greatest(CAST(ceil(q * st.n) AS BIGINT), 1))
             |      AS quantile
             |  FROM qs)
             |SELECT e.q, e.quantile,
             |  CASE WHEN st.hi = st.lo THEN st.lo
             |       ELSE st.lo +
             |         least(floor((e.quantile - st.lo) /
             |                     ((st.hi - st.lo) / 256.0)), 255) *
             |         ((st.hi - st.lo) / 256.0) END AS est,
             |  abs(e.quantile -
             |    (CASE WHEN st.hi = st.lo THEN st.lo
             |          ELSE st.lo +
             |            least(floor((e.quantile - st.lo) /
             |                        ((st.hi - st.lo) / 256.0)), 255) *
             |            ((st.hi - st.lo) / 256.0) END))
             |    <= (CASE WHEN st.hi = st.lo THEN 0.0
             |             ELSE (st.hi - st.lo) / 256.0 END) AS within_bin
             |FROM ex e, st
             |ORDER BY e.q""".stripMargin)),

    Q("ev_anomaly",
      "Daily volume anomalies per event type: each (type, day) count " +
        "z-scored against its own type's day-count distribution, " +
        "|z| > 2 flags — the ingest-feed drop/spike detector. One " +
        "shuffle to the daily aggregate; the per-type stats are a " +
        "second aggregate over the tiny (types x days) relation, " +
        "broadcast back. Daily counts are integers, so sums and " +
        "sums-of-squares are exact BIGINT arithmetic and the derived " +
        "mean/std/z are engine-identical IEEE doubles — no decimal " +
        "staging needed anywhere.",
      (s, d) => EventOps.dailyAnomalies(Tables.events(s, d),
        "event_type", "ts", z = 2.0),
      Some("""WITH daily AS (
             |  SELECT event_type, ts::DATE AS day, count(*) AS n_events
             |  FROM events GROUP BY 1, 2),
             |st AS (
             |  SELECT event_type, count(*) AS days,
             |    sum(n_events) AS s, sum(n_events * n_events) AS s2
             |  FROM daily GROUP BY 1),
             |x AS (
             |  SELECT event_type,
             |    s::DOUBLE / days AS mean_daily,
             |    sqrt(greatest(s2::DOUBLE / days -
             |      (s::DOUBLE / days) * (s::DOUBLE / days), 0.0)) AS std
             |  FROM st)
             |SELECT d.event_type, strftime(d.day, '%Y-%m-%d') AS day,
             |  d.n_events, x.mean_daily,
             |  CASE WHEN x.std > 0 THEN (d.n_events - x.mean_daily) / x.std
             |       ELSE 0.0 END AS zscore,
             |  abs(CASE WHEN x.std > 0
             |           THEN (d.n_events - x.mean_daily) / x.std
             |           ELSE 0.0 END) > 2.0 AS is_anomaly
             |FROM daily d JOIN x USING (event_type)
             |ORDER BY d.event_type, d.day""".stripMargin)),

    Q("stream_drift",
      "Structured Streaming runs the drift gate as an ingest MONITOR: " +
        "the reference snapshot's 16-bucket score histogram bootstraps " +
        "batch 0, each micro-batch appends its own bucket-count " +
        "partial under the commit-marker state machine, and serving " +
        "merges committed partials through the SAME chi-square tail as " +
        "the batch gate — bucket counts are algebraic, so " +
        "stream == batch bit-for-bit and dq_drift's oracle applies " +
        "verbatim. Per-batch cost is one narrow aggregate; the " +
        "reference is never rescanned.",
      (s, d) => {
        val path = graft.streaming.EventStream.runDriftStream(s, d,
          sys.props.getOrElse("java.io.tmpdir", "/tmp") +
            "/graft_stream_drift_" + d.replaceAll("[^A-Za-z0-9.]", "_"))
        graft.ops.Profile.driftServe(s, path)
      },
      R8Queries.all.find(_.name == "dq_drift").get.oracle)
  )
}
