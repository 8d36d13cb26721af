package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{Frequent, Graphs, LmSignals, Profile, Skew}

/** Round-9 session-3, batch 2: deterministic walk-corpus generation
  * over the near-dup graph, the count-min sketch with an exact-recount
  * gate, the exact two-sample Kolmogorov–Smirnov drift test,
  * interpolated Kneser–Ney bigram smoothing (the KenLM/CCNet smoother),
  * and the join-key skew diagnosis report.
  */
object R16Queries {

  private val WalkLen = 4
  private val CmsTopK = 20

  val all: Seq[Q] = Seq(

    Q("graph_walks",
      "DeepWalk-style walk corpus over the near-dup graph " +
        "(Graphs.deterministicWalks): one walk per node, 4 steps, " +
        "successor = the neighbor with the smallest md5(walk:step:" +
        "neighbor) — a keyed-hash walker instead of an RNG, so the " +
        "corpus every graph-embedding trainer consumes is a pure " +
        "function of the graph (stable across retries and engines). " +
        "Plan: the symmetrized edge list caches pre-partitioned on src " +
        "once; each step joins only the walks-sized frontier and picks " +
        "argmin via min_by partial aggregation — length bounded " +
        "exchanges, nothing degree-squared. The oracle replays all " +
        "four steps with the identical hash order.",
      (s, d) => Graphs.deterministicWalks(
        graft.ops.Dedup.minhashCandidates(Tables.documents(s, d),
          "doc_id", "text", graft.ops.Dedup.Shingler.words(5),
          bandsN = 2, rowsPerBand = 3),
        "id_a", "id_b", length = WalkLen),
      Some {
        val steps = (1 to WalkLen).map { k =>
          s"""s$k AS (
             |  SELECT p.walk_id,
             |    min_by(e.dst, md5(p.walk_id::VARCHAR || ':$k:' ||
             |      e.dst::VARCHAR)) AS node
             |  FROM s${k - 1} p JOIN edges e ON e.src = p.node
             |  GROUP BY p.walk_id)""".stripMargin
        }.mkString(",\n")
        val rows = (1 to WalkLen).map { k =>
          s"SELECT walk_id, CAST($k AS BIGINT) AS step, node FROM s$k"
        }.mkString("\nUNION ALL ")
        s"""WITH ${ExtQueries.minhashPairCtes},
           |edges AS (
           |  SELECT id_a AS src, id_b AS dst FROM pairs
           |  UNION SELECT id_b, id_a FROM pairs),
           |s0 AS (SELECT DISTINCT src AS walk_id, src AS node FROM edges),
           |$steps
           |SELECT walk_id, CAST(0 AS BIGINT) AS step, node FROM s0
           |UNION ALL $rows
           |ORDER BY walk_id, step""".stripMargin
      }),

    Q("ta_cms",
      "Count-min sketch (Cormode & Muthukrishnan 2005) over the corpus " +
        "token stream — the mergeable fixed-size (4×512 integer cells) " +
        "frequency summary answering point queries over a data-sized " +
        "vocabulary, probed here for the exact top-20 tokens: n_cms = " +
        "min over 4 md5-keyed hash rows of the addressed counter, " +
        "overcount = n_cms − n_exact ≥ 0 (CMS never underestimates — " +
        "the row makes the collision inflation itself hash-visible). " +
        "Plan: one explode×4 map-side-combined aggregate builds the " +
        "sketch (only 2048 cells cross the exchange), the probe " +
        "broadcasts it; the exact side is the same one-pass top-k as " +
        "ta_heavyhitters. Sketches of corpus slices ADD cell-wise — " +
        "the incremental/streaming merge seam.",
      (s, d) => {
        val toks = Frequent.wsTokens(Tables.documents(s, d), "text")
        val sketch = Frequent.countMinSketch(toks, "token")
        val top = toks.groupBy(col("token"))
          .agg(count(lit(1)).as("n_exact"))
          .orderBy(col("n_exact").desc, col("token").asc)
          .limit(CmsTopK)
        Frequent.cmsEstimate(sketch, top, "token")
          .select(col("token"), col("n_exact"), col("n_cms"),
            (col("n_cms") - col("n_exact")).as("overcount"))
          .orderBy(col("token"))
      },
      Some(s"""WITH toks AS (
              |  SELECT t.tok AS token
              |  FROM documents d,
              |       unnest(string_split_regex(trim(d.text), '\\s+')) AS t(tok)
              |  WHERE t.tok <> ''),
              |cms AS (
              |  SELECT j, ('0x' || substring(md5(j::VARCHAR || ':' || token),
              |      1, 8))::BIGINT % 512 AS bucket, count(*) AS cnt
              |  FROM toks, generate_series(0, 3) g(j)
              |  GROUP BY 1, 2),
              |top AS (
              |  SELECT token, count(*) AS n_exact FROM toks
              |  GROUP BY 1 ORDER BY n_exact DESC, token LIMIT $CmsTopK),
              |probe AS (
              |  SELECT token, n_exact, j,
              |    ('0x' || substring(md5(j::VARCHAR || ':' || token),
              |      1, 8))::BIGINT % 512 AS bucket
              |  FROM top, generate_series(0, 3) g(j))
              |SELECT p.token, any_value(p.n_exact) AS n_exact,
              |  min(c.cnt) AS n_cms,
              |  min(c.cnt) - any_value(p.n_exact) AS overcount
              |FROM probe p JOIN cms c ON c.j = p.j AND c.bucket = p.bucket
              |GROUP BY p.token
              |ORDER BY p.token""".stripMargin)),

    Q("dq_ks",
      "EXACT two-sample Kolmogorov–Smirnov test (Profile.ksTest) " +
        "between the quality-score distributions of the even- and " +
        "odd-id document halves — the distribution-free drift gate on " +
        "the continuous score itself, complementing dq_drift's binned " +
        "chi-square: D = max |F_even − F_odd| over every distinct " +
        "score, plus the smallest score achieving it and the " +
        "scale-free sqrt(nm/(n+m))·D. NO global sort: distinct scores " +
        "group with per-side counts, a 256-bin histogram's collected " +
        "totals give exclusive prefix offsets, and one window pass " +
        "PARTITIONED BY BIN adds in-bin running counts — the " +
        "dq_quantiles two-level discipline, so the only " +
        "single-partition work is 256 rows. The oracle computes the " +
        "same ECDFs with one flat window.",
      (s, d) => {
        val docs = Tables.documents(s, d)
        def half(m: Int) = docs.filter(col("doc_id") % 2 === m)
          .select(graft.ops.TextAnalysis.qualityScore(col("text"))
            .as("score"))
        Profile.ksTest(half(0), half(1), "score")
      },
      Some(s"""WITH u AS (
              |  SELECT CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS ga,
              |    ${R7Queries.qualitySql("text")} AS v
              |  FROM documents),
              |g AS (
              |  SELECT v, sum(ga) AS ca, sum(1 - ga) AS cb
              |  FROM u GROUP BY v),
              |n AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
              |             CAST(sum(cb) AS BIGINT) AS nb FROM g),
              |c AS (
              |  SELECT v, sum(ca) OVER (ORDER BY v) AS cua,
              |         sum(cb) OVER (ORDER BY v) AS cub
              |  FROM g),
              |dd AS (
              |  SELECT v, abs(CAST(cua AS DOUBLE) / na -
              |                CAST(cub AS DOUBLE) / nb) AS diff
              |  FROM c, n),
              |m AS (SELECT max(diff) AS d_stat FROM dd)
              |SELECT n.na AS n_a, n.nb AS n_b, m.d_stat,
              |  (SELECT min(v) FROM dd, m WHERE dd.diff = m.d_stat) AS d_at,
              |  sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) /
              |       (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE))) * m.d_stat
              |    AS ks_scaled
              |FROM n, m""".stripMargin)),

    Q("ta_kneser",
      "Interpolated Kneser–Ney bigram smoothing (Kneser & Ney 1995; " +
        "Chen & Goodman 1999) — the smoother inside KenLM, i.e. what " +
        "the REAL CCNet pipeline scores with: absolute discount 0.75 " +
        "off each seen bigram, freed mass backing off to the " +
        "CONTINUATION distribution (distinct predecessors, not raw " +
        "frequency — the 'San Francisco' correction). Reported for the " +
        "top-30 bigrams with the backoff weight λ(w1) and continuation " +
        "p_cont(w2) exposed. Everything derives from ONE cached pair " +
        "histogram (one corpus explode); the three stat relations are " +
        "map-side-combined regroupings of it; no logs anywhere, so " +
        "each probability is a fixed chain of IEEE ops the oracle " +
        "restates symbol-for-symbol.",
      (s, d) => LmSignals.kneserNeyBigrams(Tables.documents(s, d), "text",
        discount = 0.75, topK = 30),
      Some("""WITH w AS (
             |  SELECT string_split_regex(trim(text), '\s+') AS ws
             |  FROM documents),
             |pr AS (
             |  SELECT ws[i] AS w1, ws[i] || ' ' || ws[i+1] AS big FROM (
             |    SELECT ws, unnest(generate_series(1, len(ws) - 1)) AS i
             |    FROM w)),
             |bi AS (
             |  SELECT big, w1, substring(big, length(w1) + 2) AS w2,
             |    count(*) AS pair_count
             |  FROM pr GROUP BY 1, 2, 3),
             |pre AS (
             |  SELECT w1, CAST(sum(pair_count) AS BIGINT) AS c1,
             |    count(*) AS n1f
             |  FROM bi GROUP BY 1),
             |fol AS (SELECT w2, count(*) AS n1p FROM bi GROUP BY 1),
             |ty AS (SELECT count(*) AS n1a FROM bi),
             |top AS (
             |  SELECT big, w1, w2, pair_count FROM bi
             |  ORDER BY pair_count DESC, big LIMIT 30)
             |SELECT big AS bigram, t.pair_count, pre.c1 AS prefix_count,
             |  0.75::DOUBLE * CAST(n1f AS DOUBLE) / CAST(c1 AS DOUBLE)
             |    AS lambda,
             |  CAST(n1p AS DOUBLE) / CAST(n1a AS DOUBLE) AS p_cont,
             |  (CAST(t.pair_count AS DOUBLE) - 0.75::DOUBLE) /
             |    CAST(c1 AS DOUBLE) +
             |    (0.75::DOUBLE * CAST(n1f AS DOUBLE) / CAST(c1 AS DOUBLE)) *
             |    (CAST(n1p AS DOUBLE) / CAST(n1a AS DOUBLE)) AS p_kn
             |FROM top t JOIN pre USING (w1) JOIN fol USING (w2)
             |CROSS JOIN ty
             |ORDER BY t.pair_count DESC, bigram""".stripMargin)),

    Q("dq_skew",
      "Join-key skew diagnosis (Skew.skewReport) on lineitem's " +
        "l_returnflag — the 3-hot-key column q19_salted_join mitigates: " +
        "top keys by row count with their table share and the exact " +
        "integer salt factor ((n_key + avgLoad − 1) div avgLoad, " +
        "avgLoad = ceil(N/32)) that levels each key to average " +
        "shuffle-partition load — 1 means AQE handles it, ≥2 is the " +
        "saltBuckets floor to hand saltedJoin. ONE map-side-combined " +
        "count aggregate + TakeOrdered(k): the diagnosis never costs " +
        "more than the join's own aggregation, and nothing " +
        "key-space-sized reaches the driver.",
      (s, d) => Skew.skewReport(Tables.lineitem(s, d), "l_returnflag",
        topK = 10, partitions = 32),
      Some("""WITH c AS (
             |  SELECT l_returnflag AS key, count(*) AS n_rows
             |  FROM lineitem GROUP BY 1),
             |n AS (SELECT CAST(sum(n_rows) AS BIGINT) AS nn FROM c),
             |a AS (SELECT (nn + 31) // 32 AS avg_load FROM n)
             |SELECT key, n_rows,
             |  CAST(n_rows AS DOUBLE) / nn AS share,
             |  (n_rows + avg_load - 1) // avg_load AS salt_factor
             |FROM c, n, a
             |ORDER BY n_rows DESC, key
             |LIMIT 10""".stripMargin)))
}
