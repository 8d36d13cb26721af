package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.{Curation, Dedup, EventOps, Frequent, Graphs, Profile, Retrieval, Similarity}

/** Round-8 session, part 3: graph structure beyond PageRank (triangle
  * counting / clustering coefficients), the dimensionality-reduction
  * member of the ANN scan family (Rademacher random projection), the
  * sketch-then-exact pair every profiling pass needs at corpus scale
  * (Misra–Gries heavy hitters, histogram-guided exact quantiles), and
  * daily volume anomalies on the event stream.
  */
object R11Queries {

  private def dotSql(a: String, b: String): String = R5Queries.dotSql(a, b)

  /** Shared by ev_active_users_sketch and stream_active_users: the
    * exact coverage-expansion counts with the always-true gate column
    * (the ev_sketch bounded-error pattern).
    */
  private val activeUsersSketchOracle: String =
    """WITH daily AS (
      |  SELECT DISTINCT user_id AS u, ts::DATE AS day FROM events),
      |b AS (SELECT max(day) AS d1 FROM daily),
      |w(w) AS (VALUES (1), (7), (28)),
      |ks AS (SELECT cast(k AS INTEGER) AS k
      |       FROM generate_series(0, 27) g(k)),
      |cov AS (
      |  SELECT DISTINCT w.w, daily.u, daily.day + ks.k AS cover
      |  FROM daily, w, ks WHERE ks.k < w.w),
      |clipped AS (SELECT * FROM cov, b WHERE cover <= d1)
      |SELECT w AS window_days, strftime(cover, '%Y-%m-%d') AS day,
      |  count(*) AS active_users, true AS hll_within_tol
      |FROM clipped
      |GROUP BY w, cover
      |ORDER BY window_days, day""".stripMargin

  /** The cdc_upsert/stream_upsert change-batch fixture: replayed
    * updates (seq 1 and 2 for %10 keys), deletes that override
    * earlier updates (seq 3), and inserts at shifted keys — derived
    * deterministically from the base so the batch and streamed paths
    * apply identical changes.
    */
  private[queries] def upsertChanges(base: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    def ch(pred: org.apache.spark.sql.Column,
           name: org.apache.spark.sql.Column,
           bal: org.apache.spark.sql.Column, op: String, seq: Int,
           keyShift: Long = 0L) =
      base.filter(pred).select(
        (col("c_custkey") + lit(keyShift)).as("c_custkey"),
        name.as("c_name"), bal.as("c_acctbal"),
        lit(op).as("op"), lit(seq).as("seq"))
    ch(col("c_custkey") % 5 === 0,
      concat(lit("UPDATED_"), col("c_name")),
      col("c_acctbal") + 10.0, "U", 1)
    .unionByName(ch(col("c_custkey") % 10 === 0,
      concat(lit("UPDATED2_"), col("c_name")),
      col("c_acctbal") + 20.0, "U", 2))
    .unionByName(ch(col("c_custkey") % 7 === 3,
      col("c_name"), col("c_acctbal"), "D", 3))
    .unionByName(ch(lit(true), concat(lit("NEW_"), col("c_name")),
      col("c_acctbal"), "I", 1, keyShift = 1000000L))
  }

  /** Shared by cdc_upsert and stream_upsert: the latest-wins apply
    * of [[upsertChanges]] replayed in SQL.
    */
  private[queries] val upsertCtes: String =
    """base AS (
      |  SELECT c_custkey, c_name, c_acctbal FROM customer),
      |ch AS (
      |  SELECT c_custkey, 'UPDATED_' || c_name AS c_name,
      |    c_acctbal + 10.0 AS c_acctbal, 'U' AS op, 1 AS seq
      |  FROM base WHERE c_custkey % 5 = 0
      |  UNION ALL
      |  SELECT c_custkey, 'UPDATED2_' || c_name,
      |    c_acctbal + 20.0, 'U', 2
      |  FROM base WHERE c_custkey % 10 = 0
      |  UNION ALL
      |  SELECT c_custkey, c_name, c_acctbal, 'D', 3
      |  FROM base WHERE c_custkey % 7 = 3
      |  UNION ALL
      |  SELECT c_custkey + 1000000, 'NEW_' || c_name,
      |    c_acctbal, 'I', 1
      |  FROM base),
      |latest AS (
      |  SELECT * FROM (
      |    SELECT *, row_number() OVER (PARTITION BY c_custkey
      |      ORDER BY seq DESC) AS rn
      |    FROM ch) WHERE rn = 1),
      |merged AS (
      |  SELECT b.c_custkey, b.c_name, b.c_acctbal FROM base b
      |  WHERE b.c_custkey NOT IN (SELECT c_custkey FROM latest)
      |  UNION ALL
      |  SELECT c_custkey, c_name, c_acctbal FROM latest
      |  WHERE op <> 'D')""".stripMargin

  private val upsertOracle: String =
    s"""WITH $upsertCtes
      |SELECT c_custkey, c_name, c_acctbal FROM merged
      |ORDER BY c_custkey""".stripMargin

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

    Q("sim_recall_randproj_sweep",
      "Recall-vs-rescore-budget CURVE for the random-projection " +
        "index in one pass — the JL member gets the same treatment as " +
        "the sign-hash and IVF families (every index: a gate AND its " +
        "tuning curve): projected-distance ranking ONCE to " +
        "max(budgets), each operating point (10/25/50) a rank filter " +
        "over the same bounded shortlist re-ranked by exact cosine, " +
        "one shared ground truth.",
      (s, d) => Similarity.randProjRecallSweep(Tables.embeddings(s, d),
        "vec_id", "embedding", queryId = 0L, k = 10,
        budgets = Seq(10, 25, 50)),
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
           |ranked AS (
           |  SELECT vec_id, approx_dist,
           |    row_number() OVER (ORDER BY approx_dist, vec_id) AS rank
           |  FROM short),
           |ne AS (
           |  SELECT vec_id, sqrt(${dotSql("embedding", "embedding")}) AS nrm
           |  FROM embeddings, generate_series(1, 64) g(i) GROUP BY vec_id),
           |dots AS (
           |  SELECT e.vec_id, ${dotSql("e.embedding", "q.qe")} AS dot
           |  FROM embeddings e, q, generate_series(1, 64) g(i)
           |  GROUP BY e.vec_id),
           |pts AS (SELECT unnest([10, 25, 50]) AS budget),
           |exact AS (
           |  SELECT d.vec_id FROM dots d JOIN ne USING (vec_id), nq
           |  ORDER BY d.dot / (ne.nrm * nq.nrm) DESC, d.vec_id LIMIT 10),
           |per AS (
           |  SELECT budget, vec_id FROM (
           |    SELECT p.budget, r.vec_id,
           |      row_number() OVER (PARTITION BY p.budget
           |        ORDER BY d.dot / (ne.nrm * nq.nrm) DESC, r.vec_id)
           |        AS crn
           |    FROM ranked r JOIN dots d USING (vec_id)
           |         JOIN ne USING (vec_id), nq, pts p
           |    WHERE r.rank <= p.budget)
           |  WHERE crn <= 10),
           |hits AS (
           |  SELECT budget, count(*) AS h
           |  FROM per JOIN exact USING (vec_id) GROUP BY budget),
           |den AS (SELECT count(*) AS n FROM exact)
           |SELECT CAST(p.budget AS BIGINT) AS budget,
           |  CAST(10 AS BIGINT) AS k,
           |  coalesce(h.h, 0) AS hits,
           |  CASE WHEN den.n > 0
           |    THEN CAST(coalesce(h.h, 0) AS DOUBLE) / den.n
           |    ELSE 0.0 END AS recall
           |FROM pts p LEFT JOIN hits h ON h.budget = p.budget, den
           |ORDER BY p.budget""".stripMargin)),

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
      R8Queries.all.find(_.name == "dq_drift").get.oracle),

    Q("dq_corr",
      "Pairwise Pearson correlation matrix over lineitem's four " +
        "numeric measures in ONE scan — the feature-redundancy " +
        "profile run before trusting a scorer: per-column sum/sum-sq " +
        "and per-pair sum-of-products all share a single aggregation " +
        "pass with inputs quantized ONCE to DECIMAL(18,6) (exact for " +
        "2-decimal measures) and every product/sum after that pure " +
        "decimal arithmetic — exact and order-independent in both " +
        "engines — then the 1-row moment vector expands to C(4,2) " +
        "pair rows driver-free. " +
        "Complete-case contract (rows with any NULL drop first); " +
        "zero-variance guard decided on the same derived doubles in " +
        "both engines.",
      (s, d) => Profile.correlations(Tables.lineitem(s, d),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")),
      Some {
        val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        val pairs = for {
          i <- cols.indices; j <- cols.indices if i < j
        } yield (cols(i), cols(j))
        def q(c: String) = s"cast(round($c * 100) AS BIGINT)"
        def dsum(e: String) = s"cast(sum(cast($e AS DECIMAL(38,0))) AS DOUBLE)"
        val moments =
          cols.flatMap(c => Seq(s"${dsum(q(c))} AS s_$c",
            s"${dsum(s"${q(c)} * ${q(c)}")} AS ss_$c")) ++
          pairs.map { case (a, b) =>
            s"${dsum(s"${q(a)} * ${q(b)}")} AS sp_${a}__$b" }
        def variance(c: String) =
          s"(ss_$c / nd - (s_$c / nd) * (s_$c / nd))"
        val rows = pairs.map { case (a, b) =>
          s"""SELECT '$a' AS col_a, '$b' AS col_b, n,
             |  CASE WHEN ${variance(a)} > 0 AND ${variance(b)} > 0
             |    THEN (sp_${a}__$b / nd - (s_$a / nd) * (s_$b / nd)) /
             |         (sqrt(${variance(a)}) * sqrt(${variance(b)}))
             |    ELSE NULL END AS corr
             |FROM m""".stripMargin
        }.mkString("\nUNION ALL\n")
        s"""WITH m AS (
           |  SELECT count(*) AS n, cast(count(*) AS DOUBLE) AS nd,
           |    ${moments.mkString(",\n    ")}
           |  FROM lineitem
           |  WHERE ${cols.map(c => s"$c IS NOT NULL").mkString(" AND ")})
           |$rows
           |ORDER BY col_a, col_b""".stripMargin
      }),

    Q("graph_ppr",
      "PERSONALIZED PageRank from a seed document over the near-dup " +
        "graph — the walk-based related-items query: the surfer " +
        "teleports back to the SEED only, so ranks measure structural " +
        "proximity to it and unreachable nodes stay at exactly 0. " +
        "Same per-iteration plan as graph_pagerank (cached " +
        "pre-partitioned edges, nodes-sized rank shuffle, " +
        "DECIMAL(38,14) mass sums — every iteration bit-identical to " +
        "the unrolled-CTE oracle); deltas are the indicator restart " +
        "vector and the seed-only teleport term. Seed = the graph's " +
        "minimum node id, derived identically on both sides.",
      (s, d) => {
        val pairs = Dedup.minhashCandidates(Tables.documents(s, d),
          "doc_id", "text", Dedup.Shingler.words(5), bandsN = 2,
          rowsPerBand = 3)
        val seed = pairs
          .agg(min(least(col("id_a"), col("id_b")))).head().getLong(0)
        Graphs.personalizedPageRank(pairs, "id_a", "id_b", seed,
          damping = 0.85, iters = 3)
      },
      Some {
        val seedSql = "(SELECT s FROM sd)"
        val iterCtes = (1 to 3).map { i =>
          s"""c$i AS (
             |  SELECT e.dst AS id,
             |    cast(sum(cast(r.r / d.deg AS DECIMAL(38,14))) AS DOUBLE)
             |      AS s
             |  FROM edges e JOIN r${i - 1} r ON r.id = e.src
             |       JOIN deg d ON d.src = e.src
             |  GROUP BY e.dst),
             |r$i AS (
             |  SELECT id, 0.85::DOUBLE * s +
             |    (CASE WHEN id = $seedSql
             |          THEN (1.0::DOUBLE - 0.85::DOUBLE)
             |          ELSE 0.0::DOUBLE END) AS r
             |  FROM c$i)""".stripMargin
        }.mkString(",\n")
        s"""WITH ${ExtQueries.minhashPairCtes},
           |edges AS (
           |  SELECT id_a AS src, id_b AS dst FROM pairs
           |  UNION SELECT id_b, id_a FROM pairs),
           |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
           |sd AS (SELECT min(src) AS s FROM edges),
           |r0 AS (
           |  SELECT src AS id,
           |    CASE WHEN src = $seedSql THEN 1.0::DOUBLE
           |         ELSE 0.0::DOUBLE END AS r
           |  FROM deg),
           |$iterCtes
           |SELECT id, r AS ppr FROM r3 ORDER BY id""".stripMargin
      }),

    Q("dedup_containment",
      "Near-containment pairs — Jaccard's asymmetric companion " +
        "(|A∩B|/|A| for the smaller shingle set A): catches a short " +
        "document embedded in a longer one (wire story in an " +
        "aggregator page), where symmetric Jaccard stays low because " +
        "the union is container-dominated. Shares dedup_jaccard's " +
        "df-capped overlap core (same shingles, same boilerplate " +
        "guard); emits contained → container with the larger of the " +
        "two directional scores.",
      (s, d) => Dedup.containmentPairs(Tables.documents(s, d), "doc_id",
          "text", Dedup.Shingler.words(3), threshold = 0.8,
          maxShingleDf = 64)
        .orderBy("contained", "container"),
      Some(s"""WITH sh AS (
              |  SELECT doc_id AS id,
              |    unnest(${ExtQueries.wordShingleSqlPub("text", 3)}) AS sh
              |  FROM documents),
              |rare AS (SELECT sh FROM sh GROUP BY sh HAVING count(*) <= 64),
              |f AS (SELECT sh.id, sh.sh FROM sh JOIN rare USING (sh)),
              |counts AS (SELECT id, count(*) AS n_sh FROM f GROUP BY id),
              |common AS (
              |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_common
              |  FROM f a JOIN f b ON a.sh = b.sh AND a.id < b.id
              |  GROUP BY 1, 2),
              |j AS (
              |  SELECT id_a, id_b, n_common, ca.n_sh AS n_a, cb.n_sh AS n_b
              |  FROM common
              |  JOIN counts ca ON ca.id = id_a
              |  JOIN counts cb ON cb.id = id_b)
              |SELECT
              |  CASE WHEN n_a < n_b OR (n_a = n_b AND id_a < id_b)
              |       THEN id_a ELSE id_b END AS contained,
              |  CASE WHEN n_a < n_b OR (n_a = n_b AND id_a < id_b)
              |       THEN id_b ELSE id_a END AS container,
              |  n_common,
              |  n_common::DOUBLE / least(n_a, n_b) AS containment
              |FROM j
              |WHERE n_common::DOUBLE / least(n_a, n_b) >= 0.8
              |ORDER BY contained, container""".stripMargin)),

    Q("ev_active_users",
      "Rolling distinct active users per day for 1/7/28-day trailing " +
        "windows (DAU/WAU/MAU in one query). Exact sliding distinct " +
        "doesn't decompose, so the plan is coverage expansion over " +
        "the DEDUPED (user, day) relation — the only event-sized " +
        "shuffle — each user-day expanding to the cover days it keeps " +
        "the user active for, one distinct + count per (window, day). " +
        "Cost is independent of raw event volume.",
      (s, d) => EventOps.rollingActiveUsers(Tables.events(s, d),
        "user_id", "ts", Seq(1, 7, 28)),
      Some("""WITH daily AS (
             |  SELECT DISTINCT user_id AS u, ts::DATE AS day FROM events),
             |b AS (SELECT max(day) AS d1 FROM daily),
             |w(w) AS (VALUES (1), (7), (28)),
             |ks AS (SELECT cast(k AS INTEGER) AS k
             |       FROM generate_series(0, 27) g(k)),
             |cov AS (
             |  SELECT DISTINCT w.w, daily.u, daily.day + ks.k AS cover
             |  FROM daily, w, ks WHERE ks.k < w.w),
             |clipped AS (SELECT * FROM cov, b WHERE cover <= d1)
             |SELECT w AS window_days, strftime(cover, '%Y-%m-%d') AS day,
             |  count(*) AS active_users
             |FROM clipped
             |GROUP BY w, cover
             |ORDER BY window_days, day""".stripMargin)),

    Q("dedup_recall",
      "Recall/precision gate for the MinHash-LSH banding — the dedup " +
        "family's analogue of the ANN recall gates: ground truth is " +
        "exact capped-universe Jaccard >= 0.5 over the SAME word " +
        "5-gram shingles the bands hash, candidates are the 2x3 " +
        "banding's pairs, and the one-row report gives banding recall " +
        "(theory: P(candidate) = 1-(1-J^3)^2, so ~0.23 at the " +
        "J=0.5 boundary rising steeply toward 1 — a drop below the " +
        "curve means the banding is broken, not just coarse) and " +
        "candidate precision. Both sides reuse the existing " +
        "pair machinery; the intersect joins two bounded pair " +
        "relations.",
      (s, d) => {
        val docs = Tables.documents(s, d)
        // cached: each pair relation feeds its own count AND the
        // intersect count — without the cache the shingle/band joins
        // re-run per consumer (measured 6.4s -> the pair cost once)
        val truth = graft.core.Caches.track(
          Dedup.jaccardPairs(docs, "doc_id", "text",
            Dedup.Shingler.words(5), threshold = 0.5, maxShingleDf = 64))
        val cand = graft.core.Caches.track(
          Dedup.minhashCandidates(docs, "doc_id", "text",
            Dedup.Shingler.words(5), bandsN = 2, rowsPerBand = 3))
        val hits = truth.join(cand, Seq("id_a", "id_b"), "left_semi")
        truth.agg(count(lit(1)).as("__nt"))
          .crossJoin(cand.agg(count(lit(1)).as("__nc")))
          .crossJoin(hits.agg(count(lit(1)).as("__nh")))
          .select(col("__nt").as("n_true"), col("__nc").as("n_candidates"),
            col("__nh").as("hits"),
            when(col("__nt") > 0,
              col("__nh").cast("double") / col("__nt"))
              .otherwise(lit(0.0)).as("recall"),
            when(col("__nc") > 0,
              col("__nh").cast("double") / col("__nc"))
              .otherwise(lit(0.0)).as("precision"))
      },
      Some(
        s"""WITH ${ExtQueries.minhashPairCtes},
           |cand AS (SELECT DISTINCT id_a, id_b FROM pairs),
           |jsh AS (
           |  SELECT doc_id AS id,
           |    unnest(${ExtQueries.wordShingleSqlPub("text", 5)}) AS sh
           |  FROM documents),
           |jrare AS (SELECT sh FROM jsh GROUP BY sh HAVING count(*) <= 64),
           |jf AS (SELECT jsh.id, jsh.sh FROM jsh JOIN jrare USING (sh)),
           |jcounts AS (SELECT id, count(*) AS n_sh FROM jf GROUP BY id),
           |jcommon AS (
           |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_common
           |  FROM jf a JOIN jf b ON a.sh = b.sh AND a.id < b.id
           |  GROUP BY 1, 2),
           |truth AS (
           |  SELECT id_a, id_b FROM jcommon
           |  JOIN jcounts ca ON ca.id = id_a
           |  JOIN jcounts cb ON cb.id = id_b
           |  WHERE n_common::DOUBLE / (ca.n_sh + cb.n_sh - n_common) >= 0.5),
           |h AS (SELECT * FROM truth INTERSECT SELECT * FROM cand)
           |SELECT (SELECT count(*) FROM truth) AS n_true,
           |  (SELECT count(*) FROM cand) AS n_candidates,
           |  (SELECT count(*) FROM h) AS hits,
           |  CASE WHEN (SELECT count(*) FROM truth) > 0
           |    THEN (SELECT count(*) FROM h)::DOUBLE /
           |         (SELECT count(*) FROM truth)
           |    ELSE 0.0 END AS recall,
           |  CASE WHEN (SELECT count(*) FROM cand) > 0
           |    THEN (SELECT count(*) FROM h)::DOUBLE /
           |         (SELECT count(*) FROM cand)
           |    ELSE 0.0 END AS precision""".stripMargin)),

    Q("dedup_recall_sweep",
      "The banding TUNING CURVE behind dedup_recall's single point: " +
        "recall/precision at (bands, rows) = (1,6), (2,3), (3,2) " +
        "against the same exact-Jaccard ground truth, all three " +
        "configurations reading ONE shared cached signature (the hash " +
        "slices are common — a k-point sweep costs one shingle/hash " +
        "pass plus k band-key exchanges, not k full runs). The curve " +
        "shows the S-curve trade directly: more rows per band rejects " +
        "the merely-similar, more bands recalls weaker pairs — the " +
        "lever a curation run tunes before committing to a banding.",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
        val truth = graft.core.Caches.track(
          Dedup.jaccardPairs(docs, "doc_id", "text",
            Dedup.Shingler.words(5), threshold = 0.5, maxShingleDf = 64))
        val sweep = graft.core.Caches.track(
          Dedup.minhashCandidatesSweep(docs, "doc_id", "text",
            Dedup.Shingler.words(5), Seq((1, 6), (2, 3), (3, 2))))
        val keys = Seq("bands_n", "rows_per_band")
        val cfgs = Seq((1, 6), (2, 3), (3, 2)).toDF(keys: _*)
        val nCand = sweep.groupBy(keys.map(col): _*)
          .agg(count(lit(1)).as("__nc"))
        val hits = sweep.join(truth.select("id_a", "id_b"),
            Seq("id_a", "id_b"), "left_semi")
          .groupBy(keys.map(col): _*).agg(count(lit(1)).as("__nh"))
        cfgs.join(nCand, keys, "left").join(hits, keys, "left")
          .crossJoin(broadcast(truth.agg(count(lit(1)).as("n_true"))))
          .select(col("bands_n"), col("rows_per_band"), col("n_true"),
            coalesce(col("__nc"), lit(0L)).as("n_candidates"),
            coalesce(col("__nh"), lit(0L)).as("hits"),
            when(col("n_true") > 0,
              coalesce(col("__nh"), lit(0L)).cast("double") / col("n_true"))
              .otherwise(lit(0.0)).as("recall"),
            when(coalesce(col("__nc"), lit(0L)) > 0,
              coalesce(col("__nh"), lit(0L)).cast("double") / col("__nc"))
              .otherwise(lit(0.0)).as("precision"))
          .orderBy(col("bands_n"), col("rows_per_band"))
      },
      Some {
        def slice(i: Int) = s"substr(md5(s), ${i * 5 + 1}, 5)"
        val mhs = (0 until 6).map(i =>
          s"list_min(list_transform(${ExtQueries.wordShingleSqlPub("text", 5)}, " +
            s"s -> ${slice(i)})) AS mh$i").mkString(",\n    ")
        val configs = Seq((1, 6), (2, 3), (3, 2))
        val perCfg = configs.map { case (bn, rpb) =>
          val sfx = s"_${bn}_$rpb"
          val bands = (0 until bn).map(b =>
            s"SELECT doc_id, $b AS band, " +
              (0 until rpb).map(r => s"mh${b * rpb + r}").mkString(" || ") +
              " AS h FROM sig").mkString("\n  UNION ALL ")
          s"""bands$sfx AS (
             |  $bands),
             |bf$sfx AS (
             |  SELECT doc_id, band, h,
             |    count(*) OVER (PARTITION BY band, h) AS df_b
             |  FROM bands$sfx),
             |pairs$sfx AS (
             |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
             |  FROM bf$sfx a JOIN bf$sfx b
             |    ON a.band = b.band AND a.h = b.h AND a.doc_id < b.doc_id
             |  WHERE a.df_b <= 256
             |  UNION ALL
             |  SELECT id_a, id_b FROM (
             |    SELECT doc_id AS id_a,
             |      lead(doc_id) OVER (PARTITION BY band, h ORDER BY doc_id)
             |        AS id_b
             |    FROM bf$sfx WHERE df_b > 256)
             |  WHERE id_b IS NOT NULL),
             |cand$sfx AS (SELECT DISTINCT id_a, id_b FROM pairs$sfx),
             |h$sfx AS (SELECT * FROM truth INTERSECT
             |          SELECT * FROM cand$sfx)""".stripMargin
        }.mkString(",\n")
        val rows = configs.map { case (bn, rpb) =>
          val sfx = s"_${bn}_$rpb"
          s"""SELECT $bn AS bands_n, $rpb AS rows_per_band,
             |  (SELECT count(*) FROM truth) AS n_true,
             |  (SELECT count(*) FROM cand$sfx) AS n_candidates,
             |  (SELECT count(*) FROM h$sfx) AS hits,
             |  CASE WHEN (SELECT count(*) FROM truth) > 0
             |    THEN (SELECT count(*) FROM h$sfx)::DOUBLE /
             |         (SELECT count(*) FROM truth)
             |    ELSE 0.0 END AS recall,
             |  CASE WHEN (SELECT count(*) FROM cand$sfx) > 0
             |    THEN (SELECT count(*) FROM h$sfx)::DOUBLE /
             |         (SELECT count(*) FROM cand$sfx)
             |    ELSE 0.0 END AS precision""".stripMargin
        }.mkString("\nUNION ALL\n")
        s"""WITH sig AS (
           |  SELECT doc_id,
           |    $mhs
           |  FROM documents),
           |jsh AS (
           |  SELECT doc_id AS id,
           |    unnest(${ExtQueries.wordShingleSqlPub("text", 5)}) AS sh
           |  FROM documents),
           |jrare AS (SELECT sh FROM jsh GROUP BY sh HAVING count(*) <= 64),
           |jf AS (SELECT jsh.id, jsh.sh FROM jsh JOIN jrare USING (sh)),
           |jcounts AS (SELECT id, count(*) AS n_sh FROM jf GROUP BY id),
           |jcommon AS (
           |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_common
           |  FROM jf a JOIN jf b ON a.sh = b.sh AND a.id < b.id
           |  GROUP BY 1, 2),
           |truth AS (
           |  SELECT id_a, id_b FROM jcommon
           |  JOIN jcounts ca ON ca.id = id_a
           |  JOIN jcounts cb ON cb.id = id_b
           |  WHERE n_common::DOUBLE / (ca.n_sh + cb.n_sh - n_common) >= 0.5),
           |$perCfg
           |$rows
           |ORDER BY bands_n, rows_per_band""".stripMargin
      }),

    Q("ev_funnel_timing",
      "Conversion-timing report for the view → click → purchase " +
        "funnel: per adjacent transition, how many users converted " +
        "and how long it took them (mean + median of the stage gap). " +
        "Gaps are exact integer microseconds from the greedy chain's " +
        "matched timestamps (the per-user times array the N-stage " +
        "fold now exposes); the mean divides an exact decimal sum, " +
        "the median is percentile ≡ quantile_cont interpolation on " +
        "integers. Same single user-key exchange as ev_funnel.",
      (s, d) => graft.ops.Funnel.funnelTiming(Tables.events(s, d),
        "user_id", "ts", "event_type", Seq("view", "click", "purchase")),
      Some("""WITH v AS (
             |  SELECT user_id, min(ts) AS t FROM events
             |  WHERE event_type = 'view' GROUP BY 1),
             |c AS (
             |  SELECT e.user_id, min(e.ts) AS t
             |  FROM events e JOIN v USING (user_id)
             |  WHERE e.event_type = 'click' AND e.ts > v.t GROUP BY 1),
             |p AS (
             |  SELECT e.user_id, min(e.ts) AS t
             |  FROM events e JOIN c USING (user_id)
             |  WHERE e.event_type = 'purchase' AND e.ts > c.t GROUP BY 1),
             |g1 AS (
             |  SELECT epoch_us(c.t) - epoch_us(v.t) AS gap_us
             |  FROM c JOIN v USING (user_id)),
             |g2 AS (
             |  SELECT epoch_us(p.t) - epoch_us(c.t) AS gap_us
             |  FROM p JOIN c USING (user_id))
             |SELECT 1 AS from_idx, 'view' AS stage_from,
             |  'click' AS stage_to, count(*) AS n_converted,
             |  cast(sum(gap_us) AS DOUBLE) / count(*) / 1000000.0
             |    AS mean_gap_s,
             |  quantile_cont(gap_us, 0.5) / 1000000.0 AS p50_gap_s
             |FROM g1
             |UNION ALL
             |SELECT 2, 'click', 'purchase', count(*),
             |  cast(sum(gap_us) AS DOUBLE) / count(*) / 1000000.0,
             |  quantile_cont(gap_us, 0.5) / 1000000.0
             |FROM g2
             |ORDER BY from_idx""".stripMargin)),

    Q("dq_quantiles_by",
      "Grouped exact quantiles — dq_quantiles per event type, with no " +
        "per-key scans: one stats pass, one per-key-geometry histogram " +
        "pass (keys x bins tiny rows), driver bin location, then ONE " +
        "residual pass ranks only the targeted (key, bin) cells via a " +
        "broadcast-semi-join + bounded window. Three scans for any " +
        "number of keys x quantiles; est/within_bin hash-check the " +
        "per-key sketch geometry like the global gate.",
      (s, d) => Profile.quantilesByKey(Tables.events(s, d),
        "event_type", "value", Seq(0.5, 0.9, 0.99), bins = 256),
      Some("""WITH v AS (
             |  SELECT event_type AS k, value::DOUBLE AS v FROM events
             |  WHERE event_type IS NOT NULL AND value IS NOT NULL),
             |st AS (
             |  SELECT k, count(*) AS n, min(v) AS lo, max(v) AS hi
             |  FROM v GROUP BY k),
             |qs(q) AS (VALUES (0.5::DOUBLE), (0.9::DOUBLE), (0.99::DOUBLE)),
             |r AS (
             |  SELECT k, v,
             |    row_number() OVER (PARTITION BY k ORDER BY v) AS rn
             |  FROM v),
             |ex AS (
             |  SELECT st.k, qs.q, st.lo, st.hi,
             |    (SELECT r.v FROM r WHERE r.k = st.k
             |     AND rn = greatest(CAST(ceil(qs.q * st.n) AS BIGINT), 1))
             |      AS quantile
             |  FROM st, qs)
             |SELECT k AS key, q, quantile,
             |  CASE WHEN hi = lo THEN lo
             |       ELSE lo + least(floor((quantile - lo) /
             |                             ((hi - lo) / 256.0)), 255) *
             |            ((hi - lo) / 256.0) END AS est,
             |  abs(quantile -
             |    (CASE WHEN hi = lo THEN lo
             |          ELSE lo + least(floor((quantile - lo) /
             |                                ((hi - lo) / 256.0)), 255) *
             |               ((hi - lo) / 256.0) END))
             |    <= (CASE WHEN hi = lo THEN 0.0
             |             ELSE (hi - lo) / 256.0 END) AS within_bin
             |FROM ex
             |ORDER BY key, q""".stripMargin)),

    Q("ml_calibration",
      "Calibration (reliability) report for the trained perceptron: " +
        "rows bucket into margin QUINTILES (boundaries from one exact " +
        "percentile aggregate broadcast back — the RFM no-global-sort " +
        "pattern), each bucket reporting size, positive fraction, and " +
        "mean margin. Monotone frac_pos across buckets = the score " +
        "carries signal; flat = it doesn't — the check a learned " +
        "quality filter passes before its scores become sampling " +
        "weights. Margins are integers, so every number replays " +
        "bit-for-bit through the oracle's unrolled training.",
      (s, d) => {
        val docs = R10Queries.perceptronDocs(s, d)
        val trained = graft.ops.Perceptron.train(docs,
          Seq("toks", "chars", "punct"), "y", epochs = 3)
          .collect().maxBy(_.getLong(0))
        graft.ops.Perceptron.calibration(docs,
          Seq("toks", "chars", "punct"), "y", (3 to 6).map(trained.getLong))
      },
      Some {
        val bucket = "1 + (CASE WHEN m > t[1] THEN 1 ELSE 0 END) + " +
          "(CASE WHEN m > t[2] THEN 1 ELSE 0 END) + " +
          "(CASE WHEN m > t[3] THEN 1 ELSE 0 END) + " +
          "(CASE WHEN m > t[4] THEN 1 ELSE 0 END)"
        s"""WITH ${R10Queries.perceptronCtes},
           |sc AS (
           |  SELECT y, CAST(w.b + w.wt * toks + w.wc * chars +
           |    w.wp * punct AS BIGINT) AS mi,
           |    CAST(w.b + w.wt * toks + w.wc * chars +
           |    w.wp * punct AS DOUBLE) AS m
           |  FROM f, w3 w),
           |th AS (SELECT quantile_cont(m, [0.2, 0.4, 0.6, 0.8]) AS t
           |       FROM sc)
           |SELECT CAST($bucket AS BIGINT) AS bucket,
           |  count(*) AS n,
           |  CAST(coalesce(sum(CASE WHEN y = 1 THEN 1 END), 0) AS BIGINT)
           |    AS n_pos,
           |  CAST(coalesce(sum(CASE WHEN y = 1 THEN 1 END), 0) AS DOUBLE)
           |    / count(*) AS frac_pos,
           |  CAST(sum(mi) AS DOUBLE) / count(*) AS mean_margin
           |FROM sc, th
           |GROUP BY 1
           |ORDER BY bucket""".stripMargin
      }),

    Q("ev_active_users_sketch",
      "The rolling-active-users SKETCH path — what actually ships at " +
        "100 TB: one scan builds a per-day HLL of the user set, and " +
        "every (window, day) cell is a union of <= window daily " +
        "sketches (distinct counts don't merge across days; sketches " +
        "do), so the sliding union never rescans events. Output " +
        "carries the exact count plus the ev_sketch bounded-error " +
        "boolean: a broken union fails the round, in-bound wobble " +
        "doesn't.",
      (s, d) => EventOps.rollingActiveUsersSketch(Tables.events(s, d),
        "user_id", "ts", Seq(1, 7, 28), tol = 0.05),
      Some(activeUsersSketchOracle)),

    Q("ta_proximity",
      "Proximity ranking from the positional at-rest index — the " +
        "signal between exact phrase (gap = 1, ordered) and " +
        "bag-of-words BM25 (no positions): docs containing BOTH query " +
        "terms ranked by min |posA - posB| over occurrence pairs, " +
        "scored 1/(1+gap). Postings scan reads only the two terms' " +
        "rows (pushed term filter), a doc-keyed 2-row pivot, min-gap " +
        "computed INSIDE the row over the two position arrays, " +
        "TakeOrderedAndProject tail — the corpus is never touched.",
      (s, d) => {
        val path = sys.props.getOrElse("java.io.tmpdir", "/tmp") +
          "/graft_prox_idx_" + d.replaceAll("[^A-Za-z0-9.]", "_")
        Retrieval.writeIndex(Tables.documents(s, d), "doc_id", "text", path)
        Retrieval.proximityFromIndex(s, path, "doc_id", "spark", "vector",
          k = 15)
      },
      Some("""WITH w AS (
             |  SELECT doc_id,
             |    list_filter(string_split_regex(trim(text), '\s+'),
             |                x -> x <> '') AS ws
             |  FROM documents),
             |px AS (
             |  SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS i
             |  FROM w),
             |pa AS (SELECT doc_id, i FROM px WHERE ws[i] = 'spark'),
             |pb AS (SELECT doc_id, i FROM px WHERE ws[i] = 'vector'),
             |ta AS (SELECT doc_id, count(*) AS tf_a FROM pa GROUP BY 1),
             |tb AS (SELECT doc_id, count(*) AS tf_b FROM pb GROUP BY 1),
             |g AS (
             |  SELECT pa.doc_id, min(abs(pa.i - pb.i)) AS min_gap
             |  FROM pa JOIN pb USING (doc_id) GROUP BY 1)
             |SELECT g.doc_id, ta.tf_a, tb.tf_b, g.min_gap,
             |  1.0::DOUBLE / (1.0::DOUBLE + g.min_gap) AS prox_score
             |FROM g JOIN ta USING (doc_id) JOIN tb USING (doc_id)
             |ORDER BY prox_score DESC, g.doc_id
             |LIMIT 15""".stripMargin)),

    Q("dq_winsorize",
      "Winsorization report per event type — outlier treatment by " +
        "CLIPPING where dq_outliers flags: values clip to their " +
        "type's [p05, p95] band (boundaries from one exact percentile " +
        "aggregate broadcast back — the RFM no-global-sort pattern), " +
        "reporting clip counts and the mean before/after through " +
        "exact decimal sums — 'how much did the tail move my mean' " +
        "before a feature pipeline ships the clipped column.",
      (s, d) => Profile.winsorize(Tables.events(s, d),
        "event_type", "value", pLo = 0.05, pHi = 0.95),
      Some("""WITH th AS (
             |  SELECT event_type,
             |    quantile_cont(value, [0.05, 0.95]) AS t
             |  FROM events GROUP BY 1)
             |SELECT e.event_type, count(*) AS n,
             |  CAST(coalesce(sum(CASE WHEN value < t[1] THEN 1
             |    ELSE 0 END), 0) AS BIGINT) AS n_clipped_lo,
             |  CAST(coalesce(sum(CASE WHEN value > t[2] THEN 1
             |    ELSE 0 END), 0) AS BIGINT) AS n_clipped_hi,
             |  cast(sum(cast(value AS DECIMAL(28,8))) AS DOUBLE)
             |    / count(*) AS mean_before,
             |  cast(sum(cast(least(greatest(value, t[1]), t[2])
             |    AS DECIMAL(28,8))) AS DOUBLE) / count(*) AS mean_after
             |FROM events e JOIN th USING (event_type)
             |GROUP BY 1
             |ORDER BY 1""".stripMargin)),

    Q("stream_active_users",
      "Structured Streaming maintains the DAU/WAU/MAU sketch store: " +
        "the historical half of events bootstraps batch 0's per-day " +
        "HLL sketches, each micro-batch appends its own daily " +
        "sketches under the commit-marker state machine, and serving " +
        "unions same-day sketches across committed batches before the " +
        "shared window expansion — per-refresh cost is one narrow " +
        "daily aggregate of the new files, and the board reads " +
        "days x batches sketch rows, never events. Gate: exact counts " +
        "hash-check (ev_active_users' oracle shape), the union's " +
        "estimate bounded within 5%.",
      (s, d) => {
        val path = graft.streaming.EventStream.runActiveUsersStream(s, d,
          sys.props.getOrElse("java.io.tmpdir", "/tmp") +
            "/graft_stream_au_" + d.replaceAll("[^A-Za-z0-9.]", "_"))
        EventOps.rollingActiveUsersServeSketch(s, path,
          Tables.events(s, d), "user_id", "ts", Seq(1, 7, 28), tol = 0.05)
      },
      Some(activeUsersSketchOracle)),

    Q("cdc_upsert",
      "Latest-wins UPSERT merge (the MERGE INTO / CDC-compaction " +
        "shape, maintaining the CURRENT snapshot where cdc_scd2 " +
        "maintains history): a change batch with replayed updates " +
        "(seq 1 and 2 for the same key — highest sequence wins), " +
        "deletes that override earlier updates, and fresh inserts " +
        "applies to the customer base. The batch collapses to one row " +
        "per key via a max-of-struct aggregate (no window); the base " +
        "pays one left-anti join against the collapsed key set plus a " +
        "union — never windowed or sorted.",
      (s, d) => {
        val base = Tables.customer(s, d)
          .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        graft.ops.Cdc.upsertLatest(base, upsertChanges(base),
          Seq("c_custkey"), "seq", "op").orderBy("c_custkey")
      },
      Some(upsertOracle)),

    Q("stream_upsert",
      "Structured Streaming maintains the UPSERT SNAPSHOT — the " +
        "mini-lakehouse MERGE loop: version 0 is the base customer " +
        "snapshot, the micro-batch derives the cdc_upsert change set " +
        "and applies the latest-wins merge against the latest " +
        "COMMITTED version, writing the result as version id+1 under " +
        "the commit-marker state machine (crash leaves the previous " +
        "version serving; replay recomputes from the same committed " +
        "parent, so the chain never forks). Serving the latest " +
        "version equals the batch merge, so cdc_upsert's oracle " +
        "applies verbatim — and the committed chain is snapshot time " +
        "travel for free (serveSnapshot asOf).",
      (s, d) => {
        val path = graft.streaming.EventStream.runUpsertStream(s, d,
          sys.props.getOrElse("java.io.tmpdir", "/tmp") +
            "/graft_stream_upsert_" + d.replaceAll("[^A-Za-z0-9.]", "_"),
          upsertChanges)
        graft.ops.Cdc.serveSnapshot(s, path).orderBy("c_custkey")
      },
      Some(upsertOracle)),

    Q("doc_neyman",
      "Neyman-allocation stratified sample: a 60-doc budget splits " +
        "across sources proportional to N_h x sigma_h (variable strata " +
        "earn more budget than their row share — the optimal " +
        "allocation for a stratified mean, vs the proportional/" +
        "temperature mixtures). Sigma derives from one exact-moment " +
        "aggregate; the weight rounds to an integer so the split is " +
        "pure integer arithmetic (no cross-strata float summation); " +
        "selection is the md5-ranked deterministic draw with the " +
        "exactKPerStratum prefilter discipline (output " +
        "prefilter-invariant, undershoot raises).",
      (s, d) => Curation.neymanSample(Tables.documents(s, d), "source",
          "doc_id", "n_chars", totalBudget = 60)
        .select(col("source"), col("doc_id"), col("rk"), col("n_h"))
        .orderBy(col("source"), col("rk")),
      Some("""WITH st AS (
             |  SELECT source AS g, count(*) AS n,
             |    cast(sum(cast(n_chars AS DECIMAL(38,0))) AS DOUBLE) AS s,
             |    cast(sum(cast(n_chars * n_chars AS DECIMAL(38,0)))
             |      AS DOUBLE) AS s2
             |  FROM documents GROUP BY 1),
             |w AS (
             |  SELECT g, n,
             |    CAST(round(n * sqrt(greatest(
             |      s2 / n - (s / n) * (s / n), 0.0))) AS BIGINT) AS wq
             |  FROM st),
             |tot AS (SELECT sum(wq) AS W FROM w),
             |k AS (
             |  SELECT g, CAST(least(n, (60 * wq) // W) AS BIGINT) AS kh
             |  FROM w, tot WHERE W > 0),
             |r AS (
             |  SELECT source AS g, doc_id,
             |    row_number() OVER (PARTITION BY source
             |      ORDER BY md5(cast(doc_id AS VARCHAR)), doc_id) AS rk
             |  FROM documents)
             |SELECT r.g AS source, r.doc_id, r.rk, k.kh AS n_h
             |FROM r JOIN k USING (g)
             |WHERE r.rk <= k.kh
             |ORDER BY source, rk""".stripMargin)),

    Q("q28_grouping_sets",
      "Explicit GROUPING SETS — the arbitrary-subset member of the " +
        "cube/rollup family (q23/q13 cover the full lattice and the " +
        "prefix chain; real reports ask for a hand-picked set): " +
        "(returnflag, linestatus), (returnflag), (suppkey mod 10), () " +
        "— all four sets in ONE partial-aggregable Expand pass, " +
        "distinguished by grouping_id.",
      (s, d) => Tables.lineitem(s, d)
        .withColumn("supp_bucket", col("l_suppkey") % 10)
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_returnflag")), Seq(col("supp_bucket")), Seq()),
          col("l_returnflag"), col("l_linestatus"), col("supp_bucket"))
        .agg(grouping_id().cast("long").as("gid"),
          count(lit(1)).as("n"),
          OracleCompat.dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first,
          col("supp_bucket").asc_nulls_first)
        .select("l_returnflag", "l_linestatus", "supp_bucket", "gid",
          "n", "sum_qty"),
      Some("""WITH li AS (
             |  SELECT *, l_suppkey % 10 AS supp_bucket FROM lineitem)
             |SELECT l_returnflag, l_linestatus, supp_bucket,
             |  grouping(l_returnflag) * 4 + grouping(l_linestatus) * 2 +
             |    grouping(supp_bucket) AS gid,
             |  count(*) AS n,
             |  cast(sum(cast(l_quantity AS DECIMAL(28,8))) AS DOUBLE)
             |    AS sum_qty
             |FROM li
             |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
             |  (l_returnflag), (supp_bucket), ())
             |ORDER BY gid, l_returnflag NULLS FIRST,
             |  l_linestatus NULLS FIRST, supp_bucket NULLS FIRST""".stripMargin))
  )
}
