package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{Perceptron, RankEval}

/** Round-9 session-4, batch 1: threshold-free evaluation of the learned
  * quality scorer — the ROC curve and the AUC / average-precision
  * summary a filter model ships with before its threshold becomes a
  * curation budget decision.
  */
object R20Queries {

  /** Shared train-then-score seam (identical to ml_calibration): the
    * 3-epoch integer perceptron's final weights score every document.
    */
  private def scoredDocs(s: org.apache.spark.sql.SparkSession,
                         d: String): org.apache.spark.sql.DataFrame = {
    val docs = R10Queries.perceptronDocs(s, d)
    val trained = Perceptron.train(docs,
      Seq("toks", "chars", "punct"), "y", epochs = 3)
      .collect().maxBy(_.getLong(0))
    Perceptron.margins(docs, Seq("toks", "chars", "punct"), "y",
      (3 to 6).map(trained.getLong))
  }

  /** Shared oracle CTE chain: unrolled training (w3 weights), exact
    * integer margins, distinct-score relation with ascending inclusive
    * prefix counts, per-threshold (tp, fp) and the tie-corrected rank
    * term — everything integer until the single-division doubles.
    */
  private val rankCtes: String =
    s"""${R10Queries.perceptronCtes},
       |sc AS (
       |  SELECT CASE WHEN y = 1 THEN 1 ELSE 0 END AS p,
       |    CAST(w.b + w.wt * toks + w.wc * chars + w.wp * punct
       |      AS BIGINT) AS m
       |  FROM f, w3 w),
       |g AS (
       |  SELECT m, count(*) AS n,
       |    CAST(coalesce(sum(p), 0) AS BIGINT) AS np
       |  FROM sc GROUP BY 1),
       |tot AS (
       |  SELECT CAST(sum(np) AS BIGINT) AS npos,
       |         CAST(sum(n) - sum(np) AS BIGINT) AS nneg FROM g),
       |r AS (
       |  SELECT m, n, np,
       |    CAST(sum(n) OVER (ORDER BY m) AS BIGINT) AS cn,
       |    CAST(sum(np) OVER (ORDER BY m) AS BIGINT) AS cp
       |  FROM g),
       |c AS (
       |  SELECT m, n, np,
       |    npos - cp + np AS tp,
       |    nneg - (cn - cp) + (n - np) AS fp,
       |    np * (2 * (cn - n) + n + 1) AS rank2
       |  FROM r, tot)""".stripMargin

  val all: Seq[Q] = Seq(

    Q("ml_auc",
      "Threshold-free evaluation of the trained quality scorer: exact " +
        "ROC-AUC via the Mann-Whitney rank statistic WITH tie " +
        "correction (2U = sum over tie groups of np*(2*cumBefore+n+1) " +
        "minus NP*(NP+1) — integers end to end, surfaced as auc_num2), " +
        "Gini, and step-interpolated average precision (delta-TP at a " +
        "threshold IS its tie group's positive count, so AP folds " +
        "np*tp/(tp+fp) in descending-threshold order — the " +
        "list_reduce-replayable ordered-double idiom). One map-side-" +
        "combinable distinct-margin aggregate is the only corpus-sized " +
        "pass; cumulatives run on the distinct-score relation under " +
        "the two-level binned-prefix discipline (no global sort).",
      (s, d) => RankEval.rocAucPr(scoredDocs(s, d), "score", "y"),
      Some(
        s"""WITH $rankCtes,
           |u AS (
           |  SELECT CAST(sum(rank2) AS BIGINT) AS r2,
           |    list_reduce(
           |      list(CAST(np * tp AS DOUBLE) / CAST(tp + fp AS DOUBLE)
           |           ORDER BY m DESC),
           |      (a, b) -> a + b) AS apsum
           |  FROM c),
           |base AS (
           |  SELECT npos AS n_pos, nneg AS n_neg,
           |    r2 - npos * (npos + 1) AS auc_num2,
           |    CAST(r2 - npos * (npos + 1) AS DOUBLE)
           |      / (2.0 * npos * nneg) AS auc,
           |    apsum / npos AS avg_precision
           |  FROM u, tot)
           |SELECT n_pos, n_neg, auc_num2, auc,
           |  2.0 * auc - 1.0 AS gini, avg_precision
           |FROM base""".stripMargin)),

    Q("ml_roc",
      "The full ROC curve at every distinct score threshold " +
        "(descending): keeping rows with score >= threshold yields " +
        "(tp, fp); tpr/fpr/prec spend exactly one exact-int division " +
        "each. (tpr, fpr) walk monotonically to (1, 1) — the curve a " +
        "threshold picker reads next to ml_auc's area. Same plan " +
        "shape as ml_auc: one distinct-margin aggregate, two-level " +
        "binned prefixes, curve relation bounded by score cardinality.",
      (s, d) => RankEval.rocCurve(scoredDocs(s, d), "score", "y"),
      Some(
        s"""WITH $rankCtes
           |SELECT m AS threshold, tp, fp,
           |  CAST(tp AS DOUBLE) / npos AS tpr,
           |  CAST(fp AS DOUBLE) / nneg AS fpr,
           |  CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) AS prec
           |FROM c, tot
           |ORDER BY threshold DESC""".stripMargin)),

    Q("graph_linkpred",
      "Link prediction over the co-purchase graph (parts sharing an " +
        "order — the near-dup graph is a perfect matching on the " +
        "fixtures, wedge-free by construction): non-adjacent pairs at " +
        "distance 2 ranked by common neighbors, neighborhood Jaccard, " +
        "and the Resource Allocation index (Zhou-Lu-Zhang) — banding " +
        "miss recovery and the classic co-occurrence recommender in " +
        "one operator. RA terms are floor(1e12/deg_w) in INTEGER " +
        "division (order-independent exact sums; Adamic-Adar's " +
        "runtime-log terms are rejected by the exactness discipline). " +
        "Edge generation is per-order |items|^2 — bounded by basket " +
        "size, one orderkey exchange; wedges enumerate only through " +
        "centers with degree <= 64 — the df-cap discipline banding " +
        "already uses, semantic guard and quadratic-blowup guard at " +
        "once (fixture-measured: the cap keeps wedge volume ~2% of " +
        "the uncapped count); top-k is TakeOrderedAndProject.",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_partkey"))
        val pairs = li.as("a").join(li.as("b"),
            col("a.l_orderkey") === col("b.l_orderkey") &&
              col("a.l_partkey") < col("b.l_partkey"))
          .select(col("a.l_partkey").as("id_a"),
            col("b.l_partkey").as("id_b"))
        graft.ops.Graphs.linkPrediction(pairs, "id_a", "id_b")
      },
      Some(
        s"""WITH und AS (
           |  SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS u,
           |    greatest(a.l_partkey, b.l_partkey) AS v
           |  FROM lineitem a JOIN lineitem b
           |    ON a.l_orderkey = b.l_orderkey
           |   AND a.l_partkey < b.l_partkey),
           |edges AS (SELECT u AS src, v AS dst FROM und
           |          UNION ALL SELECT v, u FROM und),
           |deg AS (SELECT src AS id, count(*) AS degree
           |        FROM edges GROUP BY src),
           |wedge AS (
           |  SELECT e1.dst AS u, e2.dst AS v, dc.degree AS dw
           |  FROM edges e1
           |  JOIN edges e2 ON e1.src = e2.src AND e1.dst < e2.dst
           |  JOIN deg dc ON dc.id = e1.src
           |  WHERE dc.degree <= 64),
           |cand AS (
           |  SELECT u, v, CAST(count(*) AS BIGINT) AS cn,
           |    CAST(sum(1000000000000 // dw) AS BIGINT) AS ra_scaled
           |  FROM wedge GROUP BY u, v),
           |nonedge AS (
           |  SELECT c.* FROM cand c
           |  WHERE NOT EXISTS (
           |    SELECT 1 FROM und WHERE und.u = c.u AND und.v = c.v))
           |SELECT n.u AS id_a, n.v AS id_b, n.cn,
           |  du.degree AS deg_a, dv.degree AS deg_b,
           |  CAST(n.cn AS DOUBLE) /
           |    CAST(du.degree + dv.degree - n.cn AS DOUBLE) AS jaccard,
           |  n.ra_scaled
           |FROM nonedge n
           |JOIN deg du ON du.id = n.u
           |JOIN deg dv ON dv.id = n.v
           |ORDER BY n.ra_scaled DESC, n.cn DESC, id_a, id_b
           |LIMIT 50""".stripMargin)),

    Q("ev_growth",
      "Growth accounting (the quick-ratio framework): every active " +
        "(user, week) classified new / retained / resurrected, churn " +
        "attributed to the week after a user's last activity, and " +
        "quick_ratio = (new + resurrected) / churned — the per-week " +
        "state decomposition next to ev_retention's cohort grid. " +
        "Weeks are epoch-micros of the Monday truncation (integer " +
        "seam, both engines truncate to Monday); adjacency is long " +
        "arithmetic; one (user, week) distinct then a user-partitioned " +
        "lag/lead window and weeks-sized aggregates.",
      (s, d) => graft.ops.EventOps.growthAccounting(Tables.events(s, d),
        "user_id", "ts"),
      Some("""WITH uw AS (
             |  SELECT DISTINCT user_id,
             |    epoch_us(CAST(date_trunc('week', ts) AS TIMESTAMP)) AS wk
             |  FROM events WHERE user_id IS NOT NULL),
             |st AS (
             |  SELECT user_id, wk,
             |    lag(wk) OVER w AS prev_wk, lead(wk) OVER w AS next_wk
             |  FROM uw WINDOW w AS (PARTITION BY user_id ORDER BY wk)),
             |act AS (
             |  SELECT wk,
             |    CAST(coalesce(sum(CASE WHEN prev_wk IS NULL
             |      THEN 1 END), 0) AS BIGINT) AS n_new,
             |    CAST(coalesce(sum(CASE WHEN prev_wk = wk - 604800000000
             |      THEN 1 END), 0) AS BIGINT) AS n_retained,
             |    CAST(coalesce(sum(CASE WHEN prev_wk IS NOT NULL
             |      AND prev_wk < wk - 604800000000
             |      THEN 1 END), 0) AS BIGINT) AS n_resurrected
             |  FROM st GROUP BY 1),
             |ch AS (
             |  SELECT wk + 604800000000 AS wk,
             |    CAST(count(*) AS BIGINT) AS n_churned
             |  FROM st
             |  WHERE next_wk IS NULL OR next_wk > wk + 604800000000
             |  GROUP BY 1),
             |j AS (
             |  SELECT coalesce(a.wk, c.wk) AS wk,
             |    coalesce(n_new, 0) AS n_new,
             |    coalesce(n_retained, 0) AS n_retained,
             |    coalesce(n_resurrected, 0) AS n_resurrected,
             |    coalesce(n_churned, 0) AS n_churned
             |  FROM act a FULL OUTER JOIN ch c ON a.wk = c.wk)
             |SELECT strftime(make_timestamp(wk), '%Y-%m-%d') AS week_start,
             |  n_new, n_retained, n_resurrected, n_churned,
             |  CASE WHEN n_churned > 0
             |       THEN CAST(n_new + n_resurrected AS DOUBLE) /
             |            CAST(n_churned AS DOUBLE) END AS quick_ratio
             |FROM j ORDER BY week_start""".stripMargin)),

    Q("dq_benford",
      "Benford first-digit conformance on order prices — the " +
        "fabricated-data / unit-mixup tripwire for naturally-spanning " +
        "amounts: observed first-digit counts vs p(d) = log10(1+1/d) " +
        "with the chi-square statistic. Values quantize to integer " +
        "cents (one IEEE multiply + floor, identical in both " +
        "engines), the digit is the integer's first decimal character " +
        "(never a runtime log), expected probabilities are driver-" +
        "computed literals, and the 9-term chi-square folds in digit " +
        "order. One scan + a <= 9-group map-side count; everything " +
        "else runs on the 9-row digit relation.",
      (s, d) => graft.ops.Profile.benford(Tables.lineitem(s, d),
        "l_extendedprice"),
      Some {
        // exponent form: DuckDB parses E-notation literals DIRECTLY as
        // DOUBLE (correctly-rounded strtod, matching Java's round-trip
        // repr); a plain decimal would stage through DECIMAL and
        // double-round — off by 1 ulp on boundary values like log10(4/3)
        val dimRows = (1 to 9).map { dd =>
          s"($dd, ${math.log10(1.0 + 1.0 / dd)}e0)"
        }.mkString(", ")
        s"""WITH dim(first_digit, p_expected) AS (VALUES $dimRows),
           |c AS (
           |  SELECT CAST(substr(CAST(CAST(floor(l_extendedprice * 100.0)
           |    AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS first_digit
           |  FROM lineitem
           |  WHERE floor(l_extendedprice * 100.0) >= 1),
           |counts AS (
           |  SELECT first_digit, CAST(count(*) AS BIGINT) AS n_obs
           |  FROM c GROUP BY 1),
           |tot AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM counts),
           |base AS (
           |  SELECT d.first_digit, d.p_expected,
           |    coalesce(n_obs, 0) AS n_obs,
           |    CAST(n AS DOUBLE) * d.p_expected AS n_expected,
           |    (CAST(coalesce(n_obs, 0) AS DOUBLE) -
           |       CAST(n AS DOUBLE) * d.p_expected) *
           |    (CAST(coalesce(n_obs, 0) AS DOUBLE) -
           |       CAST(n AS DOUBLE) * d.p_expected) /
           |    (CAST(n AS DOUBLE) * d.p_expected) AS chi2_term
           |  FROM dim d LEFT JOIN counts USING (first_digit), tot),
           |chi AS (SELECT list_reduce(list(chi2_term ORDER BY first_digit),
           |          (a, b) -> a + b) AS chi2 FROM base)
           |SELECT first_digit, n_obs, p_expected, n_expected, chi2_term,
           |  chi2
           |FROM base, chi ORDER BY first_digit""".stripMargin
      }),

    Q("ta_rm3",
      "RM3 pseudo-relevance-feedback query expansion (Lavrenko-Croft " +
        "relevance model): BM25 retrieves a 10-doc feedback set for " +
        "the 2-term query, candidate expansion terms score by the " +
        "integer-exact RM1 evidence sum floor(1e12*tf/dl) under a " +
        "corpus stopword gate 2*df <= N (the df-cap discipline; never " +
        "a runtime log), the top-5 terms join the query, and the " +
        "rescore interpolates at lambda = 1/2: score = score_orig + " +
        "0.5*score_exp on the established quantized BM25 doubles. " +
        "Candidate mining explodes only the feedback docs (broadcast " +
        "semi-join); corpus df is one candidate-pruned scan; the " +
        "expansion list is a <= 5-row driver collect (the " +
        "section-regex compile pattern); every retrieval is a " +
        "scan-pruned TakeOrderedAndProject.",
      (s, d) => graft.ops.Retrieval.rm3Expand(Tables.documents(s, d),
        "doc_id", "text", Seq("spark", "vector")),
      Some {
        val scoreSum =
          """cast(floor(sum(cast(
            |      ((cast(n AS DOUBLE) - cast(df AS DOUBLE) + 0.5) /
            |       (cast(df AS DOUBLE) + 0.5)) *
            |      ((cast(tf AS DOUBLE) * 2.2) /
            |       (cast(tf AS DOUBLE) +
            |        1.2 * (1.0 - 0.75 + 0.75 * cast(dl AS DOUBLE) / avgdl)))
            |      AS DECIMAL(38,14))) * 1000000
            |      + cast(0.5 AS DECIMAL(38,14))) AS DOUBLE) / 1000000.0"""
            .stripMargin
        def qsum(cond: String) =
          s"""cast(floor(coalesce(sum(cast(CASE WHEN $cond THEN
             |      ((cast(n AS DOUBLE) - cast(df AS DOUBLE) + 0.5) /
             |       (cast(df AS DOUBLE) + 0.5)) *
             |      ((cast(tf AS DOUBLE) * 2.2) /
             |       (cast(tf AS DOUBLE) +
             |        1.2 * (1.0 - 0.75 + 0.75 * cast(dl AS DOUBLE) / avgdl)))
             |      END AS DECIMAL(38,14))), cast(0 AS DECIMAL(38,14)))
             |      * 1000000
             |      + cast(0.5 AS DECIMAL(38,14))) AS DOUBLE) / 1000000.0"""
            .stripMargin
        s"""WITH base AS MATERIALIZED (
           |  SELECT doc_id,
           |    list_filter(string_split_regex(trim(text), '\\s+'),
           |                x -> x <> '') AS ws
           |  FROM documents),
           |stats AS (
           |  SELECT cast(sum(len(ws)) AS DOUBLE) / count(*) AS avgdl,
           |         count(*) AS n
           |  FROM base),
           |tf0 AS (
           |  SELECT doc_id, dl, t, count(*) AS tf FROM (
           |    SELECT doc_id, len(ws) AS dl, unnest(ws) AS t FROM base)
           |  WHERE t IN ('spark', 'vector')
           |  GROUP BY 1, 2, 3),
           |dfq0 AS (SELECT t, count(*) AS df FROM tf0 GROUP BY 1),
           |fb AS (
           |  SELECT doc_id, $scoreSum AS score
           |  FROM tf0 JOIN dfq0 USING (t) CROSS JOIN stats
           |  GROUP BY doc_id
           |  ORDER BY score DESC, doc_id LIMIT 10),
           |cand AS (
           |  SELECT doc_id, dl, t, count(*) AS tf FROM (
           |    SELECT b.doc_id, len(b.ws) AS dl, unnest(b.ws) AS t
           |    FROM base b JOIN fb USING (doc_id))
           |  WHERE t NOT IN ('spark', 'vector')
           |  GROUP BY 1, 2, 3),
           |cdf AS (
           |  SELECT t, count(*) AS dfc FROM (
           |    SELECT DISTINCT doc_id, t FROM (
           |      SELECT doc_id, unnest(ws) AS t FROM base))
           |  WHERE t IN (SELECT t FROM cand)
           |  GROUP BY t),
           |w AS (
           |  SELECT c.t,
           |    CAST(sum((1000000000000 * tf) // dl) AS BIGINT) AS w2
           |  FROM cand c JOIN cdf USING (t) CROSS JOIN stats
           |  WHERE dfc * 2 <= n
           |  GROUP BY c.t),
           |expt AS (SELECT t FROM w ORDER BY w2 DESC, t LIMIT 5),
           |tf1 AS (
           |  SELECT doc_id, dl, t, count(*) AS tf FROM (
           |    SELECT doc_id, len(ws) AS dl, unnest(ws) AS t FROM base)
           |  WHERE t IN ('spark', 'vector') OR t IN (SELECT t FROM expt)
           |  GROUP BY 1, 2, 3),
           |dfq1 AS (SELECT t, count(*) AS df FROM tf1 GROUP BY 1),
           |scored AS (
           |  SELECT doc_id, count(*) AS n_terms,
           |    ${qsum("t IN ('spark', 'vector')")} AS score_orig,
           |    ${qsum("t IN (SELECT t FROM expt)")} AS score_exp
           |  FROM tf1 JOIN dfq1 USING (t) CROSS JOIN stats
           |  GROUP BY doc_id)
           |SELECT doc_id, n_terms, score_orig, score_exp,
           |  score_orig + 0.5 * score_exp AS score
           |FROM scored
           |ORDER BY score DESC, doc_id LIMIT 15""".stripMargin
      }),

    Q("ml_cv",
      "3-fold cross-validation of the integer perceptron — the " +
        "variance check a single split can't give: folds are doc_id % " +
        "3 (a pure function of the data — stable across engines and " +
        "retries), each fold's 3-epoch model trains on the other two " +
        "folds and reports its held-out confusion matrix, and " +
        "cv_accuracy pools Sigma(tp+tn)/Sigma(n) as ONE exact-integer " +
        "division (never a mean of double ratios). Nine aggregate " +
        "passes over one cached staged relation; the oracle unrolls " +
        "all three trainings fold by fold.",
      (s, d) => {
        // perceptronDocs' feature exprs + the fold, in one scan
        val withFold = Tables.documents(s, d).select(
          when(col("lang") === "en", 1L).otherwise(-1L).as("y"),
          graft.ops.TextAnalysis.tokenCountWs(col("text")).as("toks"),
          length(col("text")).cast("long").as("chars"),
          length(regexp_replace(col("text"), "[A-Za-z0-9\\s]", ""))
            .cast("long").as("punct"),
          (col("doc_id") % 3).as("fold"))
        graft.ops.Perceptron.crossValidate(withFold,
          Seq("toks", "chars", "punct"), "y", "fold", k = 3, epochs = 3)
      },
      Some {
        val margin = "w.b + w.wt * toks + w.wc * chars + w.wp * punct"
        def foldChain(f: Int): String = {
          val epochs = (1 to 3).map { e =>
            s"""m${e}_$f AS (
               |  SELECT
               |    CAST(coalesce(sum(CASE WHEN y * ($margin) <= 0
               |      THEN y END), 0) AS BIGINT) AS db,
               |    CAST(coalesce(sum(CASE WHEN y * ($margin) <= 0
               |      THEN y * toks END), 0) AS BIGINT) AS dt,
               |    CAST(coalesce(sum(CASE WHEN y * ($margin) <= 0
               |      THEN y * chars END), 0) AS BIGINT) AS dc,
               |    CAST(coalesce(sum(CASE WHEN y * ($margin) <= 0
               |      THEN y * punct END), 0) AS BIGINT) AS dp
               |  FROM fb, w${e - 1}_$f w WHERE fold <> $f),
               |w${e}_$f AS (
               |  SELECT w.b + m.db AS b, w.wt + m.dt AS wt,
               |         w.wc + m.dc AS wc, w.wp + m.dp AS wp
               |  FROM w${e - 1}_$f w, m${e}_$f m)""".stripMargin
          }.mkString(",\n")
          s"""w0_$f AS (SELECT CAST(0 AS BIGINT) AS b,
             |  CAST(0 AS BIGINT) AS wt, CAST(0 AS BIGINT) AS wc,
             |  CAST(0 AS BIGINT) AS wp),
             |$epochs,
             |cm_$f AS (
             |  SELECT CAST($f AS BIGINT) AS fold, count(*) AS n,
             |    CAST(coalesce(sum(CASE WHEN y = 1 AND ($margin) > 0
             |      THEN 1 END), 0) AS BIGINT) AS tp,
             |    CAST(coalesce(sum(CASE WHEN y = -1 AND ($margin) > 0
             |      THEN 1 END), 0) AS BIGINT) AS fp,
             |    CAST(coalesce(sum(CASE WHEN y = 1 AND ($margin) <= 0
             |      THEN 1 END), 0) AS BIGINT) AS fn,
             |    CAST(coalesce(sum(CASE WHEN y = -1 AND ($margin) <= 0
             |      THEN 1 END), 0) AS BIGINT) AS tn
             |  FROM fb, w3_$f w WHERE fold = $f)""".stripMargin
        }
        s"""WITH fb AS MATERIALIZED (
           |  SELECT CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y,
           |    CAST(CASE WHEN trim(text) = '' THEN 0
           |      ELSE len(string_split_regex(trim(text), '\\s+'))
           |      END AS BIGINT) AS toks,
           |    CAST(length(text) AS BIGINT) AS chars,
           |    CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
           |      AS BIGINT) AS punct,
           |    doc_id % 3 AS fold
           |  FROM documents),
           |${foldChain(0)},
           |${foldChain(1)},
           |${foldChain(2)},
           |cm AS (SELECT * FROM cm_0 UNION ALL SELECT * FROM cm_1
           |       UNION ALL SELECT * FROM cm_2),
           |pool AS (
           |  SELECT CAST(sum(tp + tn) AS DOUBLE) /
           |         CAST(sum(n) AS DOUBLE) AS cv FROM cm)
           |SELECT fold, n, tp, fp, fn, tn,
           |  CAST(tp + tn AS DOUBLE) / CAST(n AS DOUBLE) AS accuracy,
           |  cv AS cv_accuracy
           |FROM cm, pool ORDER BY fold""".stripMargin
      }),

    Q("sim_graphann_layout",
      "The graph-navigable index AT REST (DiskANN's storage contract): " +
        "kNN edges and vectors persist under batch=<id> subtrees with " +
        "the shared IndexCommits marker state machine — crashed builds " +
        "invisible, same-id retries idempotent, ONE maintenance story " +
        "across IVF / IVFADC / BM25 / band / graph indexes — and the " +
        "serve replays the identical beam search from the committed " +
        "relations. Defined bit-identical to sim_graphann's in-memory " +
        "path; the oracle is the same replayed build + beam walk.",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val q = graft.ops.Similarity.vectorOf(emb, "vec_id", "embedding", 0L)
        val path = sys.props.getOrElse("java.io.tmpdir", "/tmp") +
          "/graft_gann_" + d.replaceAll("[^A-Za-z0-9.]", "_")
        graft.ops.Similarity.graphAnnWriteLayout(emb, "vec_id",
          "embedding", "label", path, kNbrs = R14Queries.GraphK)
        graft.ops.Similarity.graphAnnProbeLayout(s, path, q, k = 10,
          beam = R14Queries.GraphBeam, hops = R14Queries.GraphHops)
      },
      Some(s"""WITH ${R14Queries.graphAnnCtes}
              |SELECT vec_id, cos AS cos_sim FROM b${R14Queries.GraphHops}
              |ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin)),

    Q("sim_graphann_append",
      "Incremental insertion for the at-rest graph index — the " +
        "HNSW/DiskANN insert path under the frozen-identity append " +
        "contract: build on even vec_ids (batch 0), append odd ids " +
        "(batch 1) whose out-edges are computed EXACTLY against " +
        "committed ∪ new within-block candidates while batch-0 edges " +
        "stay frozen (per-ingest cost proportional to the batch, " +
        "never the corpus — the ivfAppendLayout guarantee for graphs; " +
        "cross-batch reachability flows through entry points and " +
        "new-to-old edges). The oracle replays the frozen-edge " +
        "semantics graph union and the full beam walk over both " +
        "batches.",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val q = graft.ops.Similarity.vectorOf(emb, "vec_id", "embedding", 0L)
        val path = sys.props.getOrElse("java.io.tmpdir", "/tmp") +
          "/graft_gann_app_" + d.replaceAll("[^A-Za-z0-9.]", "_")
        graft.ops.Similarity.graphAnnWriteLayout(
          emb.filter(col("vec_id") % 2 === 0), "vec_id", "embedding",
          "label", path, kNbrs = R14Queries.GraphK)
        graft.ops.Similarity.graphAnnAppendLayout(
          emb.filter(col("vec_id") % 2 === 1), "vec_id", "embedding",
          "label", path, kNbrs = R14Queries.GraphK, batchId = 1L)
        graft.ops.Similarity.graphAnnProbeLayout(s, path, q, k = 10,
          beam = R14Queries.GraphBeam, hops = R14Queries.GraphHops)
      },
      Some {
        val k = R14Queries.GraphK
        val beam = R14Queries.GraphBeam
        val dot = R14Queries.dotSql _
        val hops = (1 to R14Queries.GraphHops).map { i =>
          s"""c$i AS (
             |  SELECT vec_id FROM b${i - 1}
             |  UNION
             |  SELECT g.dst FROM g JOIN b${i - 1} s ON g.src = s.vec_id),
             |b$i AS MATERIALIZED (
             |  SELECT s.vec_id, s.cos FROM c$i JOIN sc s USING (vec_id)
             |  ORDER BY s.cos DESC, s.vec_id LIMIT $beam)""".stripMargin
        }.mkString(",\n")
        s"""WITH q AS (SELECT embedding AS qe FROM embeddings
           |  WHERE vec_id = 0),
           |nq AS (
           |  SELECT sqrt(${dot("qe", "qe")}) AS nrm
           |  FROM q, generate_series(1, 64) g(i)),
           |ne AS MATERIALIZED (
           |  SELECT vec_id, sqrt(${dot("embedding", "embedding")}) AS nrm
           |  FROM embeddings, generate_series(1, 64) g(i) GROUP BY vec_id),
           |dots AS MATERIALIZED (
           |  SELECT e.vec_id, ${dot("e.embedding", "q.qe")} AS dot
           |  FROM embeddings e, q, generate_series(1, 64) g(i)
           |  GROUP BY e.vec_id),
           |sc AS MATERIALIZED (
           |  SELECT d.vec_id, d.dot / (ne.nrm * nq.nrm) AS cos
           |  FROM dots d JOIN ne USING (vec_id), nq),
           |pd0 AS MATERIALIZED (
           |  SELECT a.vec_id AS src, b.vec_id AS dst,
           |    ${dot("a.embedding", "b.embedding")} AS dot
           |  FROM embeddings a JOIN embeddings b
           |    ON a.label = b.label AND a.vec_id <> b.vec_id
           |   AND a.vec_id % 2 = 0 AND b.vec_id % 2 = 0,
           |    generate_series(1, 64) g(i)
           |  GROUP BY a.vec_id, b.vec_id),
           |g0 AS (
           |  SELECT src, dst FROM (
           |    SELECT p.src, p.dst,
           |      row_number() OVER (PARTITION BY p.src
           |        ORDER BY p.dot / (na.nrm * nb.nrm) DESC, p.dst) AS rn
           |    FROM pd0 p JOIN ne na ON na.vec_id = p.src
           |         JOIN ne nb ON nb.vec_id = p.dst)
           |  WHERE rn <= $k),
           |pd1 AS MATERIALIZED (
           |  SELECT a.vec_id AS src, b.vec_id AS dst,
           |    ${dot("a.embedding", "b.embedding")} AS dot
           |  FROM embeddings a JOIN embeddings b
           |    ON a.label = b.label AND a.vec_id <> b.vec_id
           |   AND a.vec_id % 2 = 1,
           |    generate_series(1, 64) g(i)
           |  GROUP BY a.vec_id, b.vec_id),
           |g1 AS (
           |  SELECT src, dst FROM (
           |    SELECT p.src, p.dst,
           |      row_number() OVER (PARTITION BY p.src
           |        ORDER BY p.dot / (na.nrm * nb.nrm) DESC, p.dst) AS rn
           |    FROM pd1 p JOIN ne na ON na.vec_id = p.src
           |         JOIN ne nb ON nb.vec_id = p.dst)
           |  WHERE rn <= $k),
           |g AS MATERIALIZED (
           |  SELECT src, dst FROM g0 UNION ALL SELECT src, dst FROM g1),
           |entries AS (
           |  SELECT vec_id FROM (
           |    SELECT vec_id,
           |      row_number() OVER (PARTITION BY label ORDER BY vec_id) AS rn
           |    FROM embeddings) WHERE rn = 1),
           |b0 AS MATERIALIZED (
           |  SELECT s.vec_id, s.cos FROM entries e JOIN sc s USING (vec_id)
           |  ORDER BY s.cos DESC, s.vec_id LIMIT $beam),
           |$hops
           |SELECT vec_id, cos AS cos_sim FROM b${R14Queries.GraphHops}
           |ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin
      }),

    Q("sim_graphann_lifecycle",
      "Full maintenance lifecycle for the at-rest graph index — " +
        "build(even) -> append(odd, frozen edges) -> tombstone-delete " +
        "(vec_id % 10 = 0) -> row/edge-preserving compact -> vacuum -> " +
        "serve: deletes apply by immediate exclusion (tombstoned nodes " +
        "leave scoring AND routing; every edge touching one drops — " +
        "stricter than DiskANN's lazy route-through, exactly " +
        "restatable), and compaction folds live vectors + live edges " +
        "into one batch WITHOUT a kNN rebuild, so the serve is " +
        "bit-identical before and after (the invariant every layout " +
        "here compacts under; the spec also pins as-of time travel " +
        "and crash-retry). The oracle replays the frozen-edge graph " +
        "union minus deleted endpoints over the surviving corpus.",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val q = graft.ops.Similarity.vectorOf(emb, "vec_id", "embedding", 0L)
        val path = sys.props.getOrElse("java.io.tmpdir", "/tmp") +
          "/graft_gann_lc_" + d.replaceAll("[^A-Za-z0-9.]", "_")
        graft.ops.Similarity.graphAnnWriteLayout(
          emb.filter(col("vec_id") % 2 === 0), "vec_id", "embedding",
          "label", path, kNbrs = R14Queries.GraphK)
        graft.ops.Similarity.graphAnnAppendLayout(
          emb.filter(col("vec_id") % 2 === 1), "vec_id", "embedding",
          "label", path, kNbrs = R14Queries.GraphK, batchId = 1L)
        graft.ops.Similarity.graphAnnDeleteLayout(
          emb.filter(col("vec_id") % 10 === 0).select(col("vec_id")),
          "vec_id", path, batchId = 2L)
        graft.ops.Similarity.graphAnnCompactLayout(s, path, "vec_id",
          newBatchId = 3L)
        graft.ops.Similarity.graphAnnVacuumLayout(s, path)
        graft.ops.Similarity.graphAnnProbeLayout(s, path, q, k = 10,
          beam = R14Queries.GraphBeam, hops = R14Queries.GraphHops)
      },
      Some {
        val k = R14Queries.GraphK
        val beam = R14Queries.GraphBeam
        val dot = R14Queries.dotSql _
        val hops = (1 to R14Queries.GraphHops).map { i =>
          s"""c$i AS (
             |  SELECT vec_id FROM b${i - 1}
             |  UNION
             |  SELECT g.dst FROM g JOIN b${i - 1} s ON g.src = s.vec_id),
             |b$i AS MATERIALIZED (
             |  SELECT s.vec_id, s.cos FROM c$i JOIN sc s USING (vec_id)
             |  ORDER BY s.cos DESC, s.vec_id LIMIT $beam)""".stripMargin
        }.mkString(",\n")
        s"""WITH q AS (SELECT embedding AS qe FROM embeddings
           |  WHERE vec_id = 0),
           |nq AS (
           |  SELECT sqrt(${dot("qe", "qe")}) AS nrm
           |  FROM q, generate_series(1, 64) g(i)),
           |ne AS MATERIALIZED (
           |  SELECT vec_id, sqrt(${dot("embedding", "embedding")}) AS nrm
           |  FROM embeddings, generate_series(1, 64) g(i) GROUP BY vec_id),
           |dots AS MATERIALIZED (
           |  SELECT e.vec_id, ${dot("e.embedding", "q.qe")} AS dot
           |  FROM embeddings e, q, generate_series(1, 64) g(i)
           |  WHERE e.vec_id % 10 <> 0
           |  GROUP BY e.vec_id),
           |sc AS MATERIALIZED (
           |  SELECT d.vec_id, d.dot / (ne.nrm * nq.nrm) AS cos
           |  FROM dots d JOIN ne USING (vec_id), nq),
           |pd0 AS MATERIALIZED (
           |  SELECT a.vec_id AS src, b.vec_id AS dst,
           |    ${dot("a.embedding", "b.embedding")} AS dot
           |  FROM embeddings a JOIN embeddings b
           |    ON a.label = b.label AND a.vec_id <> b.vec_id
           |   AND a.vec_id % 2 = 0 AND b.vec_id % 2 = 0,
           |    generate_series(1, 64) g(i)
           |  GROUP BY a.vec_id, b.vec_id),
           |g0 AS (
           |  SELECT src, dst FROM (
           |    SELECT p.src, p.dst,
           |      row_number() OVER (PARTITION BY p.src
           |        ORDER BY p.dot / (na.nrm * nb.nrm) DESC, p.dst) AS rn
           |    FROM pd0 p JOIN ne na ON na.vec_id = p.src
           |         JOIN ne nb ON nb.vec_id = p.dst)
           |  WHERE rn <= $k),
           |pd1 AS MATERIALIZED (
           |  SELECT a.vec_id AS src, b.vec_id AS dst,
           |    ${dot("a.embedding", "b.embedding")} AS dot
           |  FROM embeddings a JOIN embeddings b
           |    ON a.label = b.label AND a.vec_id <> b.vec_id
           |   AND a.vec_id % 2 = 1,
           |    generate_series(1, 64) g(i)
           |  GROUP BY a.vec_id, b.vec_id),
           |g1 AS (
           |  SELECT src, dst FROM (
           |    SELECT p.src, p.dst,
           |      row_number() OVER (PARTITION BY p.src
           |        ORDER BY p.dot / (na.nrm * nb.nrm) DESC, p.dst) AS rn
           |    FROM pd1 p JOIN ne na ON na.vec_id = p.src
           |         JOIN ne nb ON nb.vec_id = p.dst)
           |  WHERE rn <= $k),
           |g AS MATERIALIZED (
           |  SELECT src, dst FROM (
           |    SELECT src, dst FROM g0 UNION ALL SELECT src, dst FROM g1)
           |  WHERE src % 10 <> 0 AND dst % 10 <> 0),
           |entries AS (
           |  SELECT vec_id FROM (
           |    SELECT vec_id,
           |      row_number() OVER (PARTITION BY label ORDER BY vec_id) AS rn
           |    FROM embeddings WHERE vec_id % 10 <> 0) WHERE rn = 1),
           |b0 AS MATERIALIZED (
           |  SELECT s.vec_id, s.cos FROM entries e JOIN sc s USING (vec_id)
           |  ORDER BY s.cos DESC, s.vec_id LIMIT $beam),
           |$hops
           |SELECT vec_id, cos AS cos_sim FROM b${R14Queries.GraphHops}
           |ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin
      }),

    Q("stream_graphann",
      "Structured Streaming maintains the at-rest graph index: the " +
        "base slice (vec_id % 4 <> 1) bootstraps batch 0's kNN graph, " +
        "the embedding file stream appends the held-out quarter via " +
        "foreachBatch + graphAnnAppendLayout (new nodes' exact " +
        "within-block top-k edges against committed + batch, " +
        "committed edges frozen) under the micro-batch id — a " +
        "replayed micro-batch rewrites exactly its own subtree, the " +
        "stream_ivf exactly-once contract on the graph index. The " +
        "single-file fixture arrives as ONE micro-batch, so the " +
        "frozen-edge append oracle applies with the 3/4-1/4 split.",
      (s, d) => {
        val path = graft.streaming.EventStream.runGraphAnnIngestStream(
          s, d,
          sys.props.getOrElse("java.io.tmpdir", "/tmp") +
            "/graft_stream_gann_" + d.replaceAll("[^A-Za-z0-9.]", "_"),
          kNbrs = R14Queries.GraphK)
        val q = graft.ops.Similarity.vectorOf(Tables.embeddings(s, d),
          "vec_id", "embedding", 0L)
        graft.ops.Similarity.graphAnnProbeLayout(s, path, q, k = 10,
          beam = R14Queries.GraphBeam, hops = R14Queries.GraphHops)
      },
      Some {
        val k = R14Queries.GraphK
        val beam = R14Queries.GraphBeam
        val dot = R14Queries.dotSql _
        val hops = (1 to R14Queries.GraphHops).map { i =>
          s"""c$i AS (
             |  SELECT vec_id FROM b${i - 1}
             |  UNION
             |  SELECT g.dst FROM g JOIN b${i - 1} s ON g.src = s.vec_id),
             |b$i AS MATERIALIZED (
             |  SELECT s.vec_id, s.cos FROM c$i JOIN sc s USING (vec_id)
             |  ORDER BY s.cos DESC, s.vec_id LIMIT $beam)""".stripMargin
        }.mkString(",\n")
        s"""WITH q AS (SELECT embedding AS qe FROM embeddings
           |  WHERE vec_id = 0),
           |nq AS (
           |  SELECT sqrt(${dot("qe", "qe")}) AS nrm
           |  FROM q, generate_series(1, 64) g(i)),
           |ne AS MATERIALIZED (
           |  SELECT vec_id, sqrt(${dot("embedding", "embedding")}) AS nrm
           |  FROM embeddings, generate_series(1, 64) g(i) GROUP BY vec_id),
           |dots AS MATERIALIZED (
           |  SELECT e.vec_id, ${dot("e.embedding", "q.qe")} AS dot
           |  FROM embeddings e, q, generate_series(1, 64) g(i)
           |  GROUP BY e.vec_id),
           |sc AS MATERIALIZED (
           |  SELECT d.vec_id, d.dot / (ne.nrm * nq.nrm) AS cos
           |  FROM dots d JOIN ne USING (vec_id), nq),
           |pd0 AS MATERIALIZED (
           |  SELECT a.vec_id AS src, b.vec_id AS dst,
           |    ${dot("a.embedding", "b.embedding")} AS dot
           |  FROM embeddings a JOIN embeddings b
           |    ON a.label = b.label AND a.vec_id <> b.vec_id
           |   AND a.vec_id % 4 <> 1 AND b.vec_id % 4 <> 1,
           |    generate_series(1, 64) g(i)
           |  GROUP BY a.vec_id, b.vec_id),
           |g0 AS (
           |  SELECT src, dst FROM (
           |    SELECT p.src, p.dst,
           |      row_number() OVER (PARTITION BY p.src
           |        ORDER BY p.dot / (na.nrm * nb.nrm) DESC, p.dst) AS rn
           |    FROM pd0 p JOIN ne na ON na.vec_id = p.src
           |         JOIN ne nb ON nb.vec_id = p.dst)
           |  WHERE rn <= $k),
           |pd1 AS MATERIALIZED (
           |  SELECT a.vec_id AS src, b.vec_id AS dst,
           |    ${dot("a.embedding", "b.embedding")} AS dot
           |  FROM embeddings a JOIN embeddings b
           |    ON a.label = b.label AND a.vec_id <> b.vec_id
           |   AND a.vec_id % 4 = 1,
           |    generate_series(1, 64) g(i)
           |  GROUP BY a.vec_id, b.vec_id),
           |g1 AS (
           |  SELECT src, dst FROM (
           |    SELECT p.src, p.dst,
           |      row_number() OVER (PARTITION BY p.src
           |        ORDER BY p.dot / (na.nrm * nb.nrm) DESC, p.dst) AS rn
           |    FROM pd1 p JOIN ne na ON na.vec_id = p.src
           |         JOIN ne nb ON nb.vec_id = p.dst)
           |  WHERE rn <= $k),
           |g AS MATERIALIZED (
           |  SELECT src, dst FROM g0 UNION ALL SELECT src, dst FROM g1),
           |entries AS (
           |  SELECT vec_id FROM (
           |    SELECT vec_id,
           |      row_number() OVER (PARTITION BY label ORDER BY vec_id) AS rn
           |    FROM embeddings) WHERE rn = 1),
           |b0 AS MATERIALIZED (
           |  SELECT s.vec_id, s.cos FROM entries e JOIN sc s USING (vec_id)
           |  ORDER BY s.cos DESC, s.vec_id LIMIT $beam),
           |$hops
           |SELECT vec_id, cos AS cos_sim FROM b${R14Queries.GraphHops}
           |ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin
      }),

    Q("dq_integrity",
      "Referential-integrity report across five FK edges of the " +
        "warehouse (lineitem->orders/part/supplier, orders->customer, " +
        "customer->nation): per edge the child row count, NULL-key " +
        "count, orphan count (non-null keys with no parent) and " +
        "orphan fraction — the cross-TABLE complement to dq_expect's " +
        "row rules. One anti-join-shaped aggregate per edge (LEFT " +
        "JOIN distinct parent keys + conditional sums in a single " +
        "pass); Catalyst broadcasts the dimension parents.",
      (s, d) => graft.ops.Profile.referentialIntegrity(Seq(
        ("customer_nation", Tables.customer(s, d), "c_nationkey",
          Tables.nation(s, d), "n_nationkey"),
        ("lineitem_orders", Tables.lineitem(s, d), "l_orderkey",
          Tables.orders(s, d), "o_orderkey"),
        ("lineitem_part", Tables.lineitem(s, d), "l_partkey",
          Tables.part(s, d), "p_partkey"),
        ("lineitem_supplier", Tables.lineitem(s, d), "l_suppkey",
          Tables.supplier(s, d), "s_suppkey"),
        ("orders_customer", Tables.orders(s, d), "o_custkey",
          Tables.customer(s, d), "c_custkey"))),
      Some {
        def edge(name: String, child: String, ck: String, parent: String,
                 pk: String) =
          s"""SELECT '$name' AS fk, n_rows, n_nulls, n_orphans,
             |  CAST(n_orphans AS DOUBLE) / CAST(n_rows AS DOUBLE)
             |    AS orphan_frac
             |FROM (
             |  SELECT count(*) AS n_rows,
             |    CAST(coalesce(sum(CASE WHEN c.$ck IS NULL
             |      THEN 1 END), 0) AS BIGINT) AS n_nulls,
             |    CAST(coalesce(sum(CASE WHEN c.$ck IS NOT NULL
             |      AND p.$pk IS NULL THEN 1 END), 0) AS BIGINT)
             |      AS n_orphans
             |  FROM $child c LEFT JOIN
             |    (SELECT DISTINCT $pk FROM $parent) p
             |    ON c.$ck = p.$pk)""".stripMargin
        Seq(
          edge("customer_nation", "customer", "c_nationkey",
            "nation", "n_nationkey"),
          edge("lineitem_orders", "lineitem", "l_orderkey",
            "orders", "o_orderkey"),
          edge("lineitem_part", "lineitem", "l_partkey",
            "part", "p_partkey"),
          edge("lineitem_supplier", "lineitem", "l_suppkey",
            "supplier", "s_suppkey"),
          edge("orders_customer", "orders", "o_custkey",
            "customer", "c_custkey"))
          .mkString("", "\nUNION ALL\n", "\nORDER BY fk")
      }),

    Q("doc_concentration",
      "Corpus-concentration report: Gini coefficient + top-1% / " +
        "top-10% shares of TOKENS over SOURCES — the 'how much of the " +
        "corpus comes from how few domains' number every curation " +
        "audit reports. Sources group by distinct token-count value, " +
        "so the sorted-rank sum decomposes per tie group as " +
        "v*(c*cumBefore + c(c+1)/2) — integers end to end; Gini and " +
        "each share spend ONE double division. One map-side token " +
        "aggregate + one distinct-value aggregate are the only " +
        "data-sized passes; cumulatives use the two-level binned " +
        "prefix (no global sort).",
      (s, d) => graft.ops.Profile.concentration(
        Tables.documents(s, d)
          .select(col("source"),
            graft.ops.TextAnalysis.tokenCountWs(col("text")).as("__tc"))
          .groupBy(col("source"))
          .agg(sum(col("__tc")).as("tokens")),
        "tokens"),
      Some("""WITH pe AS (
             |  SELECT source,
             |    CAST(sum(CASE WHEN trim(text) = '' THEN 0
             |      ELSE len(string_split_regex(trim(text), '\s+')) END)
             |      AS BIGINT) AS v
             |  FROM documents GROUP BY source),
             |g AS (SELECT v, CAST(count(*) AS BIGINT) AS c
             |      FROM pe GROUP BY v),
             |r AS (
             |  SELECT v, c,
             |    CAST(sum(c) OVER (ORDER BY v) AS BIGINT) AS cumc,
             |    CAST(sum(CAST(v AS DECIMAL(38,0)) * c) OVER (ORDER BY v)
             |      AS DECIMAL(38,0)) AS cums
             |  FROM g),
             |tot AS (SELECT max(cumc) AS n, max(cums) AS s FROM r),
             |rr AS (
             |  SELECT CAST(sum(CAST(v AS DECIMAL(38,0)) *
             |    (CAST(c AS DECIMAL(38,0)) * (cumc - c) +
             |     (c * (c + 1)) // 2)) AS DECIMAL(38,0)) AS r2
             |  FROM r),
             |b1 AS (
             |  SELECT v, c, cumc, cums, (n * 1 + 99) // 100 AS k
             |  FROM r, tot
             |  WHERE n - cumc < (n * 1 + 99) // 100
             |    AND n - cumc + c >= (n * 1 + 99) // 100),
             |b10 AS (
             |  SELECT v, c, cumc, cums, (n * 10 + 99) // 100 AS k
             |  FROM r, tot
             |  WHERE n - cumc < (n * 10 + 99) // 100
             |    AND n - cumc + c >= (n * 10 + 99) // 100)
             |SELECT tot.n AS n_entities, CAST(tot.s AS BIGINT)
             |    AS total_value,
             |  CAST(2 * rr.r2 - (tot.n + 1) * tot.s AS DOUBLE) /
             |    CAST(CAST(tot.n AS DECIMAL(38,0)) * tot.s AS DOUBLE)
             |    AS gini,
             |  b1.k AS top1_entities,
             |  CAST((tot.s - b1.cums) + b1.v * (b1.k - (tot.n - b1.cumc))
             |    AS DOUBLE) / CAST(tot.s AS DOUBLE) AS top1_share,
             |  b10.k AS top10_entities,
             |  CAST((tot.s - b10.cums) + b10.v *
             |    (b10.k - (tot.n - b10.cumc))
             |    AS DOUBLE) / CAST(tot.s AS DOUBLE) AS top10_share
             |FROM tot, rr, b1, b10""".stripMargin))
  )
}
