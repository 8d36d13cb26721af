package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.{Curation, Retrieval, Similarity}

/** Round-7 batch 5: hybrid retrieval (the RAG-curation primitive the
  * sparse and dense halves were built for) plus the remaining selection
  * policies of a production curation stack (north-star extension surface;
  * the reference has none of these).
  */
object R8Queries {

  private val QueryTerms = Seq("dup", "spark", "vector")

  /** One training, many consumers (the R6b BPE mergeCache precedent):
    * the PQ-family quantizers are pure functions of the corpus, so the
    * six queries that share them (index + gate x three variants) train
    * once per dataset dir and serve from the memo — identical results,
    * one fifth the training cost on the bench's independent-query runs.
    */
  private val rawBooksCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[Seq[Seq[Double]]]]()
  private val coarseCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[Seq[Double]]]()
  private val residBooksCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[Seq[Seq[Double]]]]()

  private def rawBooks(s: org.apache.spark.sql.SparkSession,
                       d: String): Seq[Seq[Seq[Double]]] =
    rawBooksCache.computeIfAbsent(d, _ => Similarity.pqTrain(
      Tables.embeddings(s, d), "vec_id", "embedding", 4, 8, 1, 64))

  private def coarseCents(s: org.apache.spark.sql.SparkSession,
                          d: String): Seq[Seq[Double]] =
    coarseCache.computeIfAbsent(d, _ => Similarity.kmeansQuantized(
      Tables.embeddings(s, d), "vec_id", "embedding", 4, 1))

  private def residBooks(s: org.apache.spark.sql.SparkSession,
                         d: String): Seq[Seq[Seq[Double]]] =
    residBooksCache.computeIfAbsent(d, _ => Similarity.residualBooks(
      Tables.embeddings(s, d), "vec_id", "embedding",
      coarseCents(s, d), 4, 8, 1, 64))

  private def dotSql(a: String, b: String): String =
    s"cast(sum(cast($a[i]::DOUBLE * $b[i]::DOUBLE AS DECIMAL(38,14))) AS DOUBLE)"

  /** The ta_bm25 scoring pipeline as CTEs ending in a ranked `sparse`
    * relation (doc_id, rank_a) — the oracle restatement of
    * `rankBounded(bm25(...))`. Kept textually beside the dense CTEs so
    * the fused oracle can never drift from the two gated halves.
    */
  private[queries] def sparseCtes(topK: Int): String =
    s"""base AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(trim(text), '\\s+'),
       |                x -> x <> '') AS ws
       |  FROM documents),
       |stats AS (
       |  SELECT cast(sum(len(ws)) AS DOUBLE) / count(*) AS avgdl,
       |         count(*) AS n
       |  FROM base),
       |tf AS (
       |  SELECT doc_id, dl, t, count(*) AS tf FROM (
       |    SELECT doc_id, len(ws) AS dl, unnest(ws) AS t FROM base)
       |  WHERE t IN ('dup', 'spark', 'vector')
       |  GROUP BY 1, 2, 3),
       |dfq AS (SELECT t, count(*) AS df FROM tf GROUP BY 1),
       |bm AS (
       |  SELECT doc_id,
       |    cast(floor(sum(cast(
       |      ((cast(n AS DOUBLE) - cast(df AS DOUBLE) + 0.5) /
       |       (cast(df AS DOUBLE) + 0.5)) *
       |      ((cast(tf AS DOUBLE) * 2.2) /
       |       (cast(tf AS DOUBLE) +
       |        1.2 * (1.0 - 0.75 + 0.75 * cast(dl AS DOUBLE) / avgdl)))
       |      AS DECIMAL(38,14))) * 1000000
       |      + cast(0.5 AS DECIMAL(38,14))) AS DOUBLE)
       |      / 1000000.0 AS score
       |  FROM tf JOIN dfq USING (t) CROSS JOIN stats
       |  GROUP BY doc_id
       |  ORDER BY score DESC, doc_id
       |  LIMIT $topK),
       |sparse AS (
       |  SELECT doc_id,
       |    row_number() OVER (ORDER BY score DESC, doc_id) AS rank_a
       |  FROM bm)""".stripMargin

  /** The sim_topk pipeline as CTEs ending in a ranked `dense` relation
    * (vec_id, rank_b) — the oracle restatement of
    * `rankBounded(bruteForceTopK(...))`.
    */
  private[queries] def denseCtes(topK: Int): String =
    s"""q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
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
       |dtop AS (
       |  SELECT d.vec_id, d.dot / (ne.nrm * nq.nrm) AS cos_sim
       |  FROM dots d JOIN ne ON d.vec_id = ne.vec_id, nq
       |  ORDER BY cos_sim DESC, d.vec_id
       |  LIMIT $topK),
       |dense AS (
       |  SELECT vec_id,
       |    row_number() OVER (ORDER BY cos_sim DESC, vec_id) AS rank_b
       |  FROM dtop)""".stripMargin

  val all: Seq[Q] = Seq(

    Q("ta_hybrid_rrf",
      "Hybrid retrieval: BM25 top-15 (sparse) and brute-force cosine " +
        "top-15 against the stored query vector (dense), fused by " +
        "reciprocal-rank fusion score 1/(60+rank) summed over the lists " +
        "that retrieved each id — the standard RAG retrieval combiner " +
        "(needs no cross-modality score calibration). The expensive work " +
        "is the two bounded top-k retrievals (one scan each); the fusion " +
        "joins two <=15-row relations, driver-trivial at any corpus " +
        "size. Each RRF addend is one double division on integers and " +
        "the fused score one double add, spelled identically in the " +
        "oracle — bit-exact with no decimal staging.",
      (s, d) => {
        val sparse = Retrieval.rankBounded(
          Retrieval.bm25(Tables.documents(s, d), "doc_id", "text",
            QueryTerms, topK = 15), "doc_id", "score")
        val emb = Tables.embeddings(s, d)
        val qv = Similarity.vectorOf(emb, "vec_id", "embedding", 0L)
        val dense = Retrieval.rankBounded(
          Similarity.bruteForceTopK(emb, "vec_id", "embedding", qv, 15)
            .withColumnRenamed("vec_id", "doc_id"), "doc_id", "cos_sim")
        Retrieval.rrfFuse(sparse, dense, "doc_id", rrfK = 60, topK = 10)
      },
      Some(s"""WITH ${sparseCtes(15)},
              |${denseCtes(15)}
              |SELECT coalesce(s.doc_id, dn.vec_id) AS doc_id,
              |  rank_a, rank_b,
              |  coalesce(1.0 / (cast(60 AS DOUBLE) + cast(rank_a AS DOUBLE)), 0.0) +
              |  coalesce(1.0 / (cast(60 AS DOUBLE) + cast(rank_b AS DOUBLE)), 0.0)
              |    AS rrf_score
              |FROM sparse s FULL OUTER JOIN dense dn ON s.doc_id = dn.vec_id
              |ORDER BY rrf_score DESC, doc_id
              |LIMIT 10""".stripMargin)),

    Q("dedup_semantic",
      "SemDeDup (Abbas et al. 2023): semantic dedup by trained k-means " +
        "blocking — 16 clusters, cosine pairs scored ONLY within a " +
        "cluster, and each tau-close pair drops its member with the " +
        "HIGHER cosine to the centroid (the survivor of every duplicate " +
        "neighborhood is its most atypical member — the diversity-" +
        "preserving keep rule). Same blocked pair-join shape as " +
        "dedup_embedding (nothing all-pairs, subBlocks for hot " +
        "clusters); the keep criterion adds one broadcast join against " +
        "the kxdims centroid relation and an id-keyed semi-join.",
      (s, d) => Similarity.semanticDedup(Tables.embeddings(s, d),
        "vec_id", "embedding", kClusters = 16, iters = 2, threshold = 0.4),
      Some {
        val iters = R5Queries.ITERS
        val cFin = s"c$iters"
        // cq: the trained centroids pinned to the 1e-9 grid (see
        // Similarity.semanticDedup — kills the shortest-string decimal
        // cast drift in the means), and aq: the final full-corpus
        // assignment recomputed AGAINST cq so both engines assign with
        // the identical quantized quantizer (the helper's own final
        // assignment uses the raw means and goes unreferenced).
        s"""WITH ${R5Queries.kmeansCtesOn("embeddings", k = 16)},
           |cq AS (
           |  SELECT cluster, i, cast(cast(c AS DECIMAL(38,9)) AS DOUBLE) AS c
           |  FROM $cFin),
           |dq AS (
           |  SELECT e.vec_id, c.cluster,
           |    cast(sum(cast((e.embedding[c.i]::DOUBLE - c.c) * (e.embedding[c.i]::DOUBLE - c.c)
           |         AS DECIMAL(38,14))) AS DOUBLE) AS d
           |  FROM embeddings e, cq c
           |  GROUP BY e.vec_id, c.cluster),
           |aq AS (
           |  SELECT vec_id, cluster FROM dq
           |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d, cluster) = 1),
           |cent_arr AS (
           |  SELECT cluster, list(c ORDER BY i) AS cv FROM cq GROUP BY cluster),
           |ne2 AS (
           |  SELECT vec_id, sqrt(${dotSql("embedding", "embedding")}) AS nrm
           |  FROM embeddings, generate_series(1, 64) g(i) GROUP BY vec_id),
           |ccos AS (
           |  SELECT e.vec_id, a.cluster,
           |    list_reduce(list_transform(generate_series(1, 64),
           |        i -> e.embedding[i]::DOUBLE * ca.cv[i]), (x, y) -> x + y)
           |      / (sqrt(list_reduce(list_transform(generate_series(1, 64),
           |           i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE), (x, y) -> x + y))
           |         * sqrt(list_reduce(list_transform(generate_series(1, 64),
           |             i -> ca.cv[i] * ca.cv[i]), (x, y) -> x + y)))
           |      AS cent_cos
           |  FROM embeddings e
           |  JOIN aq a USING (vec_id)
           |  JOIN cent_arr ca ON ca.cluster = a.cluster),
           |prs AS (
           |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
           |  FROM aq a JOIN aq b
           |    ON a.cluster = b.cluster AND a.vec_id < b.vec_id),
           |pdots AS (
           |  SELECT p.id_a, p.id_b,
           |    cast(sum(cast(ea.embedding[g.i]::DOUBLE * eb.embedding[g.i]::DOUBLE
           |      AS DECIMAL(38,14))) AS DOUBLE) AS dot
           |  FROM prs p
           |  JOIN embeddings ea ON ea.vec_id = p.id_a
           |  JOIN embeddings eb ON eb.vec_id = p.id_b,
           |  generate_series(1, 64) g(i)
           |  GROUP BY p.id_a, p.id_b),
           |clse AS (
           |  SELECT id_a, id_b FROM pdots
           |  JOIN ne2 na ON na.vec_id = id_a
           |  JOIN ne2 nb ON nb.vec_id = id_b
           |  WHERE dot / (na.nrm * nb.nrm) >= 0.4),
           |dropped AS (
           |  SELECT DISTINCT
           |    CASE WHEN ca.cent_cos < cb.cent_cos
           |           OR (ca.cent_cos = cb.cent_cos AND id_a < id_b)
           |         THEN id_b ELSE id_a END AS d
           |  FROM clse
           |  JOIN ccos ca ON ca.vec_id = clse.id_a
           |  JOIN ccos cb ON cb.vec_id = clse.id_b)
           |SELECT c.vec_id, cast(c.cluster AS BIGINT) AS cluster,
           |  c.cent_cos, dr.d IS NULL AS kept
           |FROM ccos c LEFT JOIN dropped dr ON dr.d = c.vec_id
           |ORDER BY c.vec_id""".stripMargin
      }),

    Q("doc_select_frac",
      "EXACT top-20%-by-quality selection WITHOUT a global sort: one " +
        "bounded histogram aggregate finds the threshold bucket, a " +
        "pushed-down filter keeps every bucket above it, and only the " +
        "threshold bucket's rows (expected n/4096 of the corpus) pass " +
        "through the rank window — bit-identical rows to the global " +
        "row_number() cut the oracle spells, without serializing the " +
        "corpus through one window partition. Cut size ceil(frac*n) is " +
        "computed with the same double arithmetic on both engines.",
      (s, d) => Curation.selectTopFrac(Tables.documents(s, d), "doc_id",
          graft.ops.TextAnalysis.qualityScore(col("text")), frac = 0.2)
        .select(col("doc_id"), col("lang"), col("__g_q").as("q"))
        .orderBy("doc_id"),
      Some(s"""WITH s AS (
              |  SELECT doc_id, lang, ${R7Queries.qualitySql("text")} AS q
              |  FROM documents),
              |n AS (
              |  SELECT cast(ceil(0.2::DOUBLE * count(*)) AS BIGINT) AS k
              |  FROM s),
              |r AS (
              |  SELECT doc_id, lang, q,
              |    row_number() OVER (ORDER BY q DESC, doc_id) AS rn
              |  FROM s)
              |SELECT doc_id, lang, q FROM r, n
              |WHERE rn <= n.k
              |ORDER BY doc_id""".stripMargin)),

    Q("doc_select_frac_lang",
      "Per-LANGUAGE exact top-20% quality cut (a global cut silently " +
        "drains low-resource languages because quality scores are not " +
        "calibrated across them): the doc_select_frac two-pass " +
        "selection vectorized over strata — one (stratum x bucket) " +
        "histogram aggregate, per-stratum literal-CASE threshold " +
        "filters, and a rank window PARTITIONED BY language that sees " +
        "only each stratum's threshold bucket.",
      (s, d) => Curation.selectTopFracByStratum(Tables.documents(s, d),
          "doc_id", "lang",
          graft.ops.TextAnalysis.qualityScore(col("text")), frac = 0.2)
        .select(col("doc_id"), col("lang"), col("__g_q").as("q"))
        .orderBy("doc_id"),
      Some(s"""WITH s AS (
              |  SELECT doc_id, lang, ${R7Queries.qualitySql("text")} AS q
              |  FROM documents),
              |n AS (
              |  SELECT lang, cast(ceil(0.2::DOUBLE * count(*)) AS BIGINT) AS k
              |  FROM s GROUP BY lang),
              |r AS (
              |  SELECT doc_id, lang, q,
              |    row_number() OVER (PARTITION BY lang ORDER BY q DESC, doc_id) AS rn
              |  FROM s)
              |SELECT doc_id, r.lang, q FROM r JOIN n ON r.lang = n.lang
              |WHERE rn <= n.k
              |ORDER BY doc_id""".stripMargin)),

    Q("sim_pq",
      "Product-quantization ANN (Jegou et al. 2011, the billion-vector " +
        "FAISS workhorse): 4 subspaces x 16 dims, an independent 8-code " +
        "k-means codebook per subspace, every vector encoded as 4 small " +
        "codes; query scoring is ADC — a driver-precomputed (m x k) " +
        "table of per-subspace partial dots/norms, each row's " +
        "approximate cosine = 4 table lookups, the scan never touches " +
        "a float vector. Top-50 shortlist by approx cosine " +
        "(TakeOrderedAndProject), exact decimal rescore, top-10 by " +
        "exact cosine. Codebooks grid-pinned and tables built by " +
        "ordered folds, so the shortlist is bit-identical cross-engine.",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val qv = Similarity.vectorOf(emb, "vec_id", "embedding", 0L)
        Similarity.pqTopK(emb, "vec_id", "embedding", qv, m = 4, k = 8,
          iters = 1, dims = 64, rescore = 50, topK = 10,
          trainedBooks = Some(rawBooks(s, d)))
      },
      Some {
        s"""WITH ${pqCtes()},
           |dots AS (
           |  SELECT e.vec_id, ${dotSql("e.embedding", "q.qe")} AS dot
           |  FROM embeddings e JOIN short s ON s.vec_id = e.vec_id, q,
           |       generate_series(1, 64) g(i)
           |  GROUP BY e.vec_id)
           |SELECT d.vec_id, d.dot / (ne.nrm * nqe.nrm) AS cos_sim
           |FROM dots d JOIN ne ON d.vec_id = ne.vec_id, nqe
           |ORDER BY cos_sim DESC, d.vec_id
           |LIMIT 10""".stripMargin
      }),

    Q("sim_recall_pq",
      "Recall@10 gate for the PQ index: exact brute force vs PQ-ADC " +
        "shortlist(50) + exact rescore, intersected — the number that " +
        "says whether 4x16-dim codebooks of 8 codes retain enough " +
        "geometry, and the dial (m, k, rescore) to turn when they " +
        "don't. Same single-query gate shape as sim_recall_quant / " +
        "sim_recall_lsh; the batch gate (sim_recall_batch) covers the " +
        "anchor-set variant for the trained-IVF path.",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val qv = Similarity.vectorOf(emb, "vec_id", "embedding", 0L)
        val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", qv, 10)
        val approx = Similarity.pqTopK(emb, "vec_id", "embedding", qv,
          m = 4, k = 8, iters = 1, dims = 64, rescore = 50, topK = 10,
          trainedBooks = Some(rawBooks(s, d)))
        Similarity.recallAtK(exact, approx, "vec_id", 10)
      },
      Some {
        s"""WITH ${pqCtes()},
           |dots AS (
           |  SELECT e.vec_id, ${dotSql("e.embedding", "q.qe")} AS dot
           |  FROM embeddings e, q, generate_series(1, 64) g(i)
           |  GROUP BY e.vec_id),
           |exact AS (
           |  SELECT d.vec_id FROM dots d JOIN ne USING (vec_id), nqe
           |  ORDER BY d.dot / (ne.nrm * nqe.nrm) DESC, d.vec_id LIMIT 10),
           |approx AS (
           |  SELECT d.vec_id
           |  FROM dots d JOIN ne USING (vec_id) JOIN short s USING (vec_id), nqe
           |  ORDER BY d.dot / (ne.nrm * nqe.nrm) DESC, d.vec_id LIMIT 10)
           |SELECT CAST(10 AS BIGINT) AS k,
           |  count(*) AS hits,
           |  CASE WHEN (SELECT count(*) FROM exact) > 0
           |    THEN CAST(count(*) AS DOUBLE) /
           |         (SELECT count(*) FROM exact)
           |    ELSE 0.0 END AS recall
           |FROM approx JOIN exact USING (vec_id)""".stripMargin
      }),

    Q("sim_ivfpq",
      "IVF-PQ (non-residual): the two quantizers composed as deployed " +
        "billion-vector indexes do — the coarse k-means prunes to " +
        "nprobe=2 of 4 clusters (partition pruning on the at-rest " +
        "layout), PQ-ADC ranks WITHIN the probed rows reading only code " +
        "arrays, exact decimal rescore on the 50-candidate shortlist. " +
        "One full-corpus PQ codebook serves every probe. The coarse " +
        "shortlist is a driver-side ordered-fold cosine over the " +
        "grid-pinned centroids — bit-identical to the oracle's " +
        "list_reduce restatement, so pruning, ADC ranking and rescore " +
        "shortlist agree engine-exactly.",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val qv = Similarity.vectorOf(emb, "vec_id", "embedding", 0L)
        Similarity.ivfPqTopK(emb, "vec_id", "embedding", qv, nprobe = 2,
          kCoarse = 4, coarseIters = 1, m = 4, k = 8, iters = 1,
          dims = 64, rescore = 50, topK = 10,
          trainedCoarse = Some(coarseCents(s, d)),
          trainedBooks = Some(rawBooks(s, d)))
      },
      Some(s"""WITH $ivfPqChain,
              |$rescoreTail""".stripMargin)),

    Q("ev_funnel",
      "Strict sequential conversion funnel over the event stream: users " +
        "whose first view precedes a click that precedes a purchase — " +
        "each stage's timestamp must strictly follow the previous " +
        "stage's (the ordering constraint that separates a funnel from " +
        "three independent counts). Served by the generic N-stage " +
        "Funnel operator: ONE hash exchange on user_id collects each " +
        "user's sorted relevant events, the greedy earliest-match chain " +
        "runs INSIDE the row as a left fold, and the three counts are " +
        "one conditional 1-row aggregate — the join-per-stage shape " +
        "this replaced planned one exchange per stage. Integer output, " +
        "no float drift surface at all.",
      (s, d) => {
        val depths = graft.ops.Funnel.userDepths(Tables.events(s, d),
          "user_id", "ts", "event_type", Seq("view", "click", "purchase"))
        depths.agg(
          coalesce(sum(when(col("depth") >= 1, 1L).otherwise(0L)), lit(0L))
            .as("n_view"),
          coalesce(sum(when(col("depth") >= 2, 1L).otherwise(0L)), lit(0L))
            .as("n_view_click"),
          coalesce(sum(when(col("depth") >= 3, 1L).otherwise(0L)), lit(0L))
            .as("n_view_click_purchase"))
      },
      Some("""WITH v AS (
             |  SELECT user_id, min(ts) AS v FROM events
             |  WHERE event_type = 'view' GROUP BY 1),
             |c AS (
             |  SELECT e.user_id, min(e.ts) AS c
             |  FROM events e JOIN v USING (user_id)
             |  WHERE e.event_type = 'click' AND e.ts > v.v GROUP BY 1),
             |p AS (
             |  SELECT e.user_id, min(e.ts) AS p
             |  FROM events e JOIN c USING (user_id)
             |  WHERE e.event_type = 'purchase' AND e.ts > c.c GROUP BY 1)
             |SELECT (SELECT count(*) FROM v) AS n_view,
             |       (SELECT count(*) FROM c) AS n_view_click,
             |       (SELECT count(*) FROM p) AS n_view_click_purchase""".stripMargin)),

    Q("ev_retention",
      "Cohort retention matrix: users grouped by signup week (their " +
        "min signup event), counted as retained in every ISO week they " +
        "show ANY activity — the (cohort x activity-week) grid every " +
        "product-analytics stack draws. user-keyed cohort aggregate, " +
        "(user, week) distinct, one co-partitioned join, bounded " +
        "(weeks x weeks) output. Weeks emitted as date strings so the " +
        "timestamp type never crosses the engine boundary.",
      (s, d) => graft.ops.EventOps.cohortRetention(Tables.events(s, d),
          "user_id", "ts", "event_type", cohortType = "signup")
        .orderBy(col("cohort_week"), col("active_week")),
      Some("""WITH cohort AS (
             |  SELECT user_id,
             |    strftime(date_trunc('week', min(ts)), '%Y-%m-%d') AS cohort_week
             |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
             |activity AS (
             |  SELECT DISTINCT user_id,
             |    strftime(date_trunc('week', ts), '%Y-%m-%d') AS active_week
             |  FROM events)
             |SELECT cohort_week, active_week,
             |  count(DISTINCT user_id) AS n_users
             |FROM cohort JOIN activity USING (user_id)
             |GROUP BY 1, 2
             |ORDER BY 1, 2""".stripMargin)),

    Q("ta_bm25_asof",
      "Index TIME TRAVEL: build the text index from the even-id half " +
        "(batch 0), append the odd-id half (batch 1), then serve " +
        "as-of batch 0 — only commit markers with id <= asOf replay, " +
        "so the query sees the index exactly as a reader did after " +
        "batch 0 committed (sound because batch ids are monotone, the " +
        "BatchLedger contract; vacuum is the retention horizon, the " +
        "same trade every lakehouse table format makes). The oracle is " +
        "BM25 over only the even-id documents — time travel must equal " +
        "a fresh build of the as-of corpus.",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val path = sys.props.getOrElse("java.io.tmpdir", "/tmp") +
          "/graft_bm25_asof_" + d.replaceAll("[^A-Za-z0-9.]", "_")
        Retrieval.writeIndex(docs.filter(col("doc_id") % 2 === 0),
          "doc_id", "text", path)
        Retrieval.appendToIndex(docs.filter(col("doc_id") % 2 === 1),
          "doc_id", "text", path, batchId = 1L)
        Retrieval.bm25FromIndex(s, path, "doc_id", QueryTerms,
          topK = 15, asOf = 0L)
      },
      Some(s"""WITH base AS (
             |  SELECT doc_id,
             |    list_filter(string_split_regex(trim(text), '\\s+'),
             |                x -> x <> '') AS ws
             |  FROM documents
             |  WHERE doc_id % 2 = 0),
             |stats AS (
             |  SELECT cast(sum(len(ws)) AS DOUBLE) / count(*) AS avgdl,
             |         count(*) AS n
             |  FROM base),
             |tf AS (
             |  SELECT doc_id, dl, t, count(*) AS tf FROM (
             |    SELECT doc_id, len(ws) AS dl, unnest(ws) AS t FROM base)
             |  WHERE t IN ('dup', 'spark', 'vector')
             |  GROUP BY 1, 2, 3),
             |dfq AS (SELECT t, count(*) AS df FROM tf GROUP BY 1)
             |SELECT doc_id, count(*) AS n_terms,
             |  cast(floor(sum(cast(
             |    ((cast(n AS DOUBLE) - cast(df AS DOUBLE) + 0.5) /
             |     (cast(df AS DOUBLE) + 0.5)) *
             |    ((cast(tf AS DOUBLE) * 2.2) /
             |     (cast(tf AS DOUBLE) +
             |      1.2 * (1.0 - 0.75 + 0.75 * cast(dl AS DOUBLE) / avgdl)))
             |    AS DECIMAL(38,14))) * 1000000
             |    + cast(0.5 AS DECIMAL(38,14))) AS DOUBLE)
             |    / 1000000.0 AS score
             |FROM tf JOIN dfq USING (t) CROSS JOIN stats
             |GROUP BY doc_id
             |ORDER BY score DESC, doc_id
             |LIMIT 15""".stripMargin)),

    Q("dq_drift",
      "Distribution-drift gate: histogram the quality score of a " +
        "reference snapshot (even doc ids) and a current snapshot (odd " +
        "ids) over 16 shared buckets and report each bucket's " +
        "two-sample chi-square contribution (cur-e)^2/e, e = reference " +
        "count scaled to the current total — the pre-filter check that " +
        "catches a silently shifted crawl before a tuned filter over- " +
        "or under-cuts it. Log-free by design (PSI/KL would drag libm " +
        "ln into the gate); one conditional-aggregation pass, never a " +
        "join between snapshots; per-bucket attribution kept so WHICH " +
        "band drifted stays visible; novel mass (ref 0) reports NULL.",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val q = graft.ops.TextAnalysis.qualityScore(col("text"))
        graft.ops.Profile.drift(
          docs.filter(col("doc_id") % 2 === 0),
          docs.filter(col("doc_id") % 2 === 1), q, buckets = 16)
      },
      Some(s"""WITH t AS (
              |  SELECT cast(least(greatest(floor((${R7Queries.qualitySql("text")}) * 16),
              |                    0.0::DOUBLE), 15.0::DOUBLE) AS INTEGER) AS bucket,
              |         doc_id % 2 AS half
              |  FROM documents),
              |h AS (
              |  SELECT bucket,
              |    cast(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ref_n,
              |    cast(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cur_n
              |  FROM t GROUP BY bucket),
              |tot AS (
              |  SELECT cast(sum(ref_n) AS BIGINT) AS nr,
              |         cast(sum(cur_n) AS BIGINT) AS nc FROM h)
              |SELECT bucket, ref_n, cur_n,
              |  CASE WHEN ref_n > 0 THEN
              |    (cast(cur_n AS DOUBLE) -
              |      cast(ref_n AS DOUBLE) * (cast(nc AS DOUBLE) / cast(nr AS DOUBLE))) *
              |    (cast(cur_n AS DOUBLE) -
              |      cast(ref_n AS DOUBLE) * (cast(nc AS DOUBLE) / cast(nr AS DOUBLE))) /
              |    (cast(ref_n AS DOUBLE) * (cast(nc AS DOUBLE) / cast(nr AS DOUBLE)))
              |  ELSE NULL END AS chi2_contrib
              |FROM h, tot
              |ORDER BY bucket NULLS LAST""".stripMargin)),

    Q("sim_ivfadc",
      "True IVFADC (Jegou et al. 2011 SIV): PQ encodes the RESIDUAL " +
        "vec - coarse_centroid, concentrating the codebook budget where " +
        "the probed cluster lives, and scoring uses the FAISS " +
        "precomputed-table decomposition — dot(q,c+r) = qc[cluster] + " +
        "sum td[code]; |c+r|^2 = cn2[cluster] + sum(2*cross[cluster]" +
        "[code] + tn[code]) — so query time is pure table lookups over " +
        "(coarse id, codes); no vector is reconstructed. Coarse prune " +
        "to nprobe=2, ADC shortlist 50, exact decimal rescore. All " +
        "tables are driver-side ordered folds over grid-pinned " +
        "quantizers, bit-identical to the oracle's list_reduce chains.",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val qv = Similarity.vectorOf(emb, "vec_id", "embedding", 0L)
        Similarity.ivfAdcTopK(emb, "vec_id", "embedding", qv, nprobe = 2,
          kCoarse = 4, coarseIters = 1, m = 4, k = 8, iters = 1,
          dims = 64, rescore = 50, topK = 10,
          trainedCoarse = Some(coarseCents(s, d)),
          trainedBooks = Some(residBooks(s, d)))
      },
      Some(s"""WITH $ivfAdcChain,
              |$rescoreTail""".stripMargin)),

    Q("sim_recall_ivfpq",
      "Recall@10 gate for the composed IVF-PQ index: exact brute force " +
        "vs coarse-prune + ADC shortlist + exact rescore — catches both " +
        "failure modes at once (a mis-ranked coarse shortlist hiding " +
        "the true neighbors' clusters, and codebooks too coarse for the " +
        "rescore budget). Shares the full IVF-PQ oracle chain with the " +
        "gated index, so gate and gated can never drift.",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val qv = Similarity.vectorOf(emb, "vec_id", "embedding", 0L)
        val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", qv, 10)
        val approx = Similarity.ivfPqTopK(emb, "vec_id", "embedding", qv,
          nprobe = 2, kCoarse = 4, coarseIters = 1, m = 4, k = 8,
          iters = 1, dims = 64, rescore = 50, topK = 10,
          trainedCoarse = Some(coarseCents(s, d)),
          trainedBooks = Some(rawBooks(s, d)))
        Similarity.recallAtK(exact, approx, "vec_id", 10)
      },
      Some(s"""WITH $ivfPqChain,
              |$recallTail""".stripMargin)),

    Q("dq_drift_lang",
      "Categorical drift gate: the chi-square mix-shift check over the " +
        "LANGUAGE column between the even-id (reference) and odd-id " +
        "(current) snapshot halves — 'did this crawl's language " +
        "distribution move?' is the first question a mixture-targeted " +
        "pipeline asks before trusting last month's sampling rates. " +
        "Same log-free per-group chi-square as dq_drift, grouped by " +
        "the key's values; one conditional-aggregation pass, never a " +
        "join between snapshots.",
      (s, d) => {
        val docs = Tables.documents(s, d)
        graft.ops.Profile.driftByKey(
          docs.filter(col("doc_id") % 2 === 0),
          docs.filter(col("doc_id") % 2 === 1), col("lang"))
      },
      Some("""WITH t AS (
             |  SELECT lang AS key, doc_id % 2 AS half FROM documents),
             |h AS (
             |  SELECT key,
             |    cast(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ref_n,
             |    cast(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cur_n
             |  FROM t GROUP BY key),
             |tot AS (
             |  SELECT cast(sum(ref_n) AS BIGINT) AS nr,
             |         cast(sum(cur_n) AS BIGINT) AS nc FROM h)
             |SELECT key, ref_n, cur_n,
             |  CASE WHEN ref_n > 0 THEN
             |    (cast(cur_n AS DOUBLE) -
             |      cast(ref_n AS DOUBLE) * (cast(nc AS DOUBLE) / cast(nr AS DOUBLE))) *
             |    (cast(cur_n AS DOUBLE) -
             |      cast(ref_n AS DOUBLE) * (cast(nc AS DOUBLE) / cast(nr AS DOUBLE))) /
             |    (cast(ref_n AS DOUBLE) * (cast(nc AS DOUBLE) / cast(nr AS DOUBLE)))
             |  ELSE NULL END AS chi2_contrib
             |FROM h, tot
             |ORDER BY key NULLS LAST""".stripMargin)),

    Q("sim_ivfadc_layout",
      "The IVFADC layout AT REST: rows store (id, 4 PQ codes, vec) " +
        "partitioned by coarse cluster with centroids + codebooks " +
        "persisted beside the data. The probe's ADC stage reads ONLY " +
        "(id, pq_code) from the nprobe pruned partitions — scan " +
        "bandwidth is m*log2(k) bits per row instead of dims*32, THE " +
        "reason billion-vector indexes store codes — and the rescore " +
        "re-reads vectors for just the shortlisted ids (spec pins the " +
        "pruned-partition count and the vector-free ADC ReadSchema). " +
        "Serving is defined bit-identical to sim_ivfadc, so that " +
        "query's oracle gates this layout verbatim.",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val qv = Similarity.vectorOf(emb, "vec_id", "embedding", 0L)
        val path = sys.props.getOrElse("java.io.tmpdir", "/tmp") +
          "/graft_ivfadc_" + d.replaceAll("[^A-Za-z0-9.]", "_")
        // injected trained quantizers (the R8 memo): same training
        // inputs as the in-builder path, so the layout is identical —
        // the build now pays encode cost only, not a fifth re-training
        Similarity.ivfAdcWriteLayout(emb, "vec_id", "embedding", path,
          kCoarse = 4, coarseIters = 1, m = 4, k = 8, iters = 1, dims = 64,
          trainedCoarse = Some(coarseCents(s, d)),
          trainedBooks = Some(residBooks(s, d)))
        Similarity.ivfAdcProbeLayout(s, path, qv, k = 10, nprobe = 2,
          rescore = 50)
      },
      Some(s"""WITH $ivfAdcChain,
              |$rescoreTail""".stripMargin)),

    Q("sim_recall_ivfadc",
      "Recall@10 gate for true IVFADC: the residual encoding should " +
        "recover accuracy the raw-vector PQ loses inside a probed " +
        "cluster — this row is the measurement (compare against " +
        "sim_recall_ivfpq at identical nprobe/m/k/rescore budgets). " +
        "Shares the full IVFADC oracle chain with the gated index.",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val qv = Similarity.vectorOf(emb, "vec_id", "embedding", 0L)
        val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", qv, 10)
        val approx = Similarity.ivfAdcTopK(emb, "vec_id", "embedding", qv,
          nprobe = 2, kCoarse = 4, coarseIters = 1, m = 4, k = 8,
          iters = 1, dims = 64, rescore = 50, topK = 10,
          trainedCoarse = Some(coarseCents(s, d)),
          trainedBooks = Some(residBooks(s, d)))
        Similarity.recallAtK(exact, approx, "vec_id", 10)
      },
      Some(s"""WITH $ivfAdcChain,
              |$recallTail""".stripMargin)))

  /** Exact-rescore tail shared by every ADC-family oracle: score the
    * `short` candidates with the decimal-exact cosine, final top-10.
    */
  private[queries] lazy val rescoreTail: String =
    s"""dots AS (
       |  SELECT e.vec_id, ${dotSql("e.embedding", "q.qe")} AS dot
       |  FROM embeddings e JOIN short s ON s.vec_id = e.vec_id, q,
       |       generate_series(1, 64) g(i)
       |  GROUP BY e.vec_id)
       |SELECT d.vec_id, d.dot / (ne.nrm * nqe.nrm) AS cos_sim
       |FROM dots d JOIN ne ON d.vec_id = ne.vec_id, nqe
       |ORDER BY cos_sim DESC, d.vec_id
       |LIMIT 10""".stripMargin

  /** Recall-gate tail shared by the ADC-family gates: exact top-10 over
    * the whole corpus vs the `short`-rescored top-10, intersected.
    */
  private lazy val recallTail: String =
    s"""dots AS (
       |  SELECT e.vec_id, ${dotSql("e.embedding", "q.qe")} AS dot
       |  FROM embeddings e, q, generate_series(1, 64) g(i)
       |  GROUP BY e.vec_id),
       |exact AS (
       |  SELECT d.vec_id FROM dots d JOIN ne USING (vec_id), nqe
       |  ORDER BY d.dot / (ne.nrm * nqe.nrm) DESC, d.vec_id LIMIT 10),
       |approx AS (
       |  SELECT d.vec_id
       |  FROM dots d JOIN ne USING (vec_id) JOIN short s USING (vec_id), nqe
       |  ORDER BY d.dot / (ne.nrm * nqe.nrm) DESC, d.vec_id LIMIT 10)
       |SELECT CAST(10 AS BIGINT) AS k,
       |  count(*) AS hits,
       |  CASE WHEN (SELECT count(*) FROM exact) > 0
       |    THEN CAST(count(*) AS DOUBLE) /
       |         (SELECT count(*) FROM exact)
       |    ELSE 0.0 END AS recall
       |FROM approx JOIN exact USING (vec_id)""".stripMargin

  /** The coarse-quantizer CTE block (train, quantize, assign, arrays,
    * cosine shortlist) injected into the PQ chain for the IVF-PQ probe.
    */
  private lazy val coarseCtes: String =
    s""",
       |${R5Queries.kmeansCtesOn("embeddings", k = 4, prefix = "pc_",
          iters = 1, dims = 64)},
       |cqc AS (
       |  SELECT cluster, i, cast(cast(c AS DECIMAL(38,9)) AS DOUBLE) AS c
       |  FROM pc_c1),
       |dqc AS (
       |  SELECT e.vec_id, c.cluster,
       |    cast(sum(cast((e.embedding[c.i]::DOUBLE - c.c) * (e.embedding[c.i]::DOUBLE - c.c)
       |         AS DECIMAL(38,14))) AS DOUBLE) AS d
       |  FROM embeddings e, cqc c GROUP BY e.vec_id, c.cluster),
       |aqc AS (
       |  SELECT vec_id, cluster FROM dqc
       |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d, cluster) = 1),
       |cac AS (
       |  SELECT cluster, list(c ORDER BY i) AS cv FROM cqc GROUP BY cluster),
       |ccosc AS (
       |  SELECT cluster,
       |    list_reduce(list_transform(generate_series(1, 64),
       |      i -> q.qe[i]::DOUBLE * cv[i]), (x, y) -> x + y)
       |    / (sqrt(list_reduce(list_transform(generate_series(1, 64),
       |        i -> cv[i] * cv[i]), (x, y) -> x + y)) * nqv.nq) AS cos
       |  FROM cac, q, nqv),
       |cshort AS (SELECT cluster FROM ccosc ORDER BY cos DESC, cluster LIMIT 2)""".stripMargin

  /** The full IVF-PQ chain: the shared PQ chain with the coarse block
    * injected and scores restricted to the probed clusters — shared by
    * sim_ivfpq and its recall gate.
    */
  private lazy val ivfPqChain: String =
    pqCtes(extraAfterNqv = coarseCtes,
      scoresJoin = "\n  JOIN aqc ac ON ac.vec_id = a0.vec_id",
      scoresWhere = "WHERE ac.cluster IN (SELECT cluster FROM cshort)")

  /** The full IVFADC chain (coarse quantizer, residual relation, four
    * residual-slice PQ trainings, ADC score tables, probe-restricted
    * scores, `short`, and the exact-norm CTEs) — shared by sim_ivfadc
    * and its recall gate so index and gate can never drift.
    */
  private lazy val ivfAdcChain: String = ivfAdcChainOn("embeddings", None)

  /** [[ivfAdcChain]] with the TRAINING relations parameterized — the
    * oracle restatement of the frozen-quantizer append path: the coarse
    * quantizer trains on `coarseTrainRel` (caller defines that CTE),
    * the residual codebooks train on the residuals of rows matching
    * `bookTrainPred`, and assignment/encoding/probing still cover the
    * FULL corpus — exactly the union a build-then-append layout serves.
    * `servePred` restricts which rows the index SERVES (the tombstone
    * filter of a delete/compact lifecycle) without touching training:
    * deleted rows still shaped the quantizers, they just never reach
    * the ADC shortlist — exactly what a tombstoned/compacted layout
    * computes.
    */
  private[queries] def ivfAdcChainOn(coarseTrainRel: String,
                                     bookTrainPred: Option[String],
                                     servePred: Option[String] = None): String = {
        val M = 4; val SUB = 16
        val coarseChain = R5Queries.kmeansCtesOn(coarseTrainRel, k = 4,
          prefix = "pc_", iters = 1, dims = 64)
        val residTr = bookTrainPred.map(p => s""",
           |residtr AS (
           |  SELECT vec_id, coarse, embedding FROM resid WHERE $p)""".stripMargin)
          .getOrElse("")
        val residChains = (0 until M).map { s =>
          val trainCte = bookTrainPred.map(_ => s"""rsubtr$s AS (
             |  SELECT vec_id, embedding[${s * SUB + 1}:${(s + 1) * SUB}] AS embedding
             |  FROM residtr),
             |""".stripMargin).getOrElse("")
          val trainRel =
            if (bookTrainPred.isDefined) s"rsubtr$s" else s"rsub$s"
          s"""rsub$s AS (
             |  SELECT vec_id, embedding[${s * SUB + 1}:${(s + 1) * SUB}] AS embedding
             |  FROM resid),
             |$trainCte${R5Queries.kmeansCtesOn(trainRel, k = 8, prefix = s"r${s}_",
                iters = 1, assignRel = trainRel, dims = SUB)},
             |rcq$s AS (
             |  SELECT cluster, i, cast(cast(c AS DECIMAL(38,9)) AS DOUBLE) AS c
             |  FROM r${s}_c1),
             |rdq$s AS (
             |  SELECT e.vec_id, c.cluster,
             |    cast(sum(cast((e.embedding[c.i]::DOUBLE - c.c) * (e.embedding[c.i]::DOUBLE - c.c)
             |         AS DECIMAL(38,14))) AS DOUBLE) AS d
             |  FROM rsub$s e, rcq$s c GROUP BY e.vec_id, c.cluster),
             |raq$s AS (
             |  SELECT vec_id, cluster FROM rdq$s
             |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d, cluster) = 1),
             |rca$s AS (
             |  SELECT cluster, list(c ORDER BY i) AS cv FROM rcq$s GROUP BY cluster),
             |rtb$s AS (
             |  SELECT cluster,
             |    list_reduce(list_transform(generate_series(1, $SUB),
             |      i -> q.qe[${s * SUB} + i]::DOUBLE * cv[i]), (x, y) -> x + y) AS td,
             |    list_reduce(list_transform(generate_series(1, $SUB),
             |      i -> cv[i] * cv[i]), (x, y) -> x + y) AS tn
             |  FROM rca$s, q),
             |xx$s AS (
             |  SELECT cc.cluster AS ccl, b.cluster AS code,
             |    list_reduce(list_transform(generate_series(1, $SUB),
             |      i -> cc.cv[${s * SUB} + i] * b.cv[i]), (x, y) -> x + y) AS x
             |  FROM cac cc, rca$s b)""".stripMargin
        }.mkString("," + "\n")
        s"""q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
           |nqv AS (
           |  SELECT sqrt(list_reduce(list_transform(generate_series(1, 64),
           |    i -> qe[i]::DOUBLE * qe[i]::DOUBLE), (x, y) -> x + y)) AS nq
           |  FROM q),
           |$coarseChain,
           |cqc AS (
           |  SELECT cluster, i, cast(cast(c AS DECIMAL(38,9)) AS DOUBLE) AS c
           |  FROM pc_c1),
           |dqc AS (
           |  SELECT e.vec_id, c.cluster,
           |    cast(sum(cast((e.embedding[c.i]::DOUBLE - c.c) * (e.embedding[c.i]::DOUBLE - c.c)
           |         AS DECIMAL(38,14))) AS DOUBLE) AS d
           |  FROM embeddings e, cqc c GROUP BY e.vec_id, c.cluster),
           |aqc AS (
           |  SELECT vec_id, cluster FROM dqc
           |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d, cluster) = 1),
           |cac AS (
           |  SELECT cluster, list(c ORDER BY i) AS cv FROM cqc GROUP BY cluster),
           |qcv AS (
           |  SELECT cluster,
           |    list_reduce(list_transform(generate_series(1, 64),
           |      i -> q.qe[i]::DOUBLE * cv[i]), (x, y) -> x + y) AS qc
           |  FROM cac, q),
           |cnv AS (
           |  SELECT cluster,
           |    list_reduce(list_transform(generate_series(1, 64),
           |      i -> cv[i] * cv[i]), (x, y) -> x + y) AS cn2
           |  FROM cac),
           |cshort AS (
           |  SELECT c.cluster FROM qcv c JOIN cnv n USING (cluster), nqv
           |  ORDER BY c.qc / (sqrt(n.cn2) * nqv.nq) DESC, c.cluster LIMIT 2),
           |resid AS (
           |  SELECT e.vec_id, a.cluster AS coarse,
           |    list_transform(generate_series(1, 64),
           |      i -> e.embedding[i]::DOUBLE - ca.cv[i]) AS embedding
           |  FROM embeddings e
           |  JOIN aqc a USING (vec_id)
           |  JOIN cac ca ON ca.cluster = a.cluster)$residTr,
           |$residChains,
           |scores AS (
           |  SELECT r.vec_id,
           |    (qcv.qc + t0.td + t1.td + t2.td + t3.td) /
           |    (sqrt(cnv.cn2 + (2 * x0.x + t0.tn) + (2 * x1.x + t1.tn)
           |          + (2 * x2.x + t2.tn) + (2 * x3.x + t3.tn)) * nqv.nq) AS approx
           |  FROM resid r
           |  JOIN raq0 a0 ON a0.vec_id = r.vec_id
           |  JOIN raq1 a1 ON a1.vec_id = r.vec_id
           |  JOIN raq2 a2 ON a2.vec_id = r.vec_id
           |  JOIN raq3 a3 ON a3.vec_id = r.vec_id
           |  JOIN qcv ON qcv.cluster = r.coarse
           |  JOIN cnv ON cnv.cluster = r.coarse
           |  JOIN rtb0 t0 ON t0.cluster = a0.cluster
           |  JOIN rtb1 t1 ON t1.cluster = a1.cluster
           |  JOIN rtb2 t2 ON t2.cluster = a2.cluster
           |  JOIN rtb3 t3 ON t3.cluster = a3.cluster
           |  JOIN xx0 x0 ON x0.ccl = r.coarse AND x0.code = a0.cluster
           |  JOIN xx1 x1 ON x1.ccl = r.coarse AND x1.code = a1.cluster
           |  JOIN xx2 x2 ON x2.ccl = r.coarse AND x2.code = a2.cluster
           |  JOIN xx3 x3 ON x3.ccl = r.coarse AND x3.code = a3.cluster, nqv
           |  WHERE r.coarse IN (SELECT cluster FROM cshort)${
             servePred.map(p => s"\n    AND ($p)").getOrElse("")}),
           |short AS (SELECT vec_id FROM scores ORDER BY approx DESC, vec_id LIMIT 50),
           |nqe AS (
           |  SELECT sqrt(${dotSql("qe", "qe")}) AS nrm
           |  FROM q, generate_series(1, 64) g(i)),
           |ne AS (
           |  SELECT vec_id, sqrt(${dotSql("embedding", "embedding")}) AS nrm
           |  FROM embeddings, generate_series(1, 64) g(i) GROUP BY vec_id)""".stripMargin
  }

  /** The PQ training/encode/ADC chain as CTEs ending in `short` (the
    * rescore shortlist), plus the exact-norm CTEs (`ne`, `nqe`) the
    * rescore tail needs — shared textually by sim_pq, its recall gate
    * and sim_ivfpq so none can drift from the others. `extraAfterNqv`
    * injects additional CTEs (the coarse-quantizer chain);
    * `scoresJoin`/`scoresWhere` restrict the ADC scoring relation (the
    * IVF probe).
    */
  private[queries] def pqCtes(extraAfterNqv: String = "", scoresJoin: String = "",
                     scoresWhere: String = ""): String = {
    val M = 4; val SUB = 16
    val subs = (0 until M).map { s =>
      s"""sub$s AS (
         |  SELECT vec_id, embedding[${s * SUB + 1}:${(s + 1) * SUB}] AS embedding
         |  FROM embeddings)""".stripMargin
    }.mkString("," + "\n")
    val chains = (0 until M).map(s =>
      R5Queries.kmeansCtesOn(s"sub$s", k = 8, prefix = s"p${s}_",
        iters = 1, assignRel = s"sub$s", dims = SUB)).mkString("," + "\n")
    val percode = (0 until M).map { s =>
      s"""cq$s AS (
         |  SELECT cluster, i, cast(cast(c AS DECIMAL(38,9)) AS DOUBLE) AS c
         |  FROM p${s}_c1),
         |dq$s AS (
         |  SELECT e.vec_id, c.cluster,
         |    cast(sum(cast((e.embedding[c.i]::DOUBLE - c.c) * (e.embedding[c.i]::DOUBLE - c.c)
         |         AS DECIMAL(38,14))) AS DOUBLE) AS d
         |  FROM sub$s e, cq$s c GROUP BY e.vec_id, c.cluster),
         |aq$s AS (
         |  SELECT vec_id, cluster FROM dq$s
         |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d, cluster) = 1),
         |ca$s AS (
         |  SELECT cluster, list(c ORDER BY i) AS cv FROM cq$s GROUP BY cluster),
         |tb$s AS (
         |  SELECT cluster,
         |    list_reduce(list_transform(generate_series(1, $SUB),
         |      i -> q.qe[${s * SUB} + i]::DOUBLE * cv[i]), (x, y) -> x + y) AS td,
         |    list_reduce(list_transform(generate_series(1, $SUB),
         |      i -> cv[i] * cv[i]), (x, y) -> x + y) AS tn
         |  FROM ca$s, q)""".stripMargin
    }.mkString("," + "\n")
    s"""q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |$subs,
       |$chains,
       |$percode,
       |nqv AS (
       |  SELECT sqrt(list_reduce(list_transform(generate_series(1, 64),
       |    i -> qe[i]::DOUBLE * qe[i]::DOUBLE), (x, y) -> x + y)) AS nq
       |  FROM q)$extraAfterNqv,
       |scores AS (
       |  SELECT a0.vec_id,
       |    (t0.td + t1.td + t2.td + t3.td) /
       |    (sqrt(t0.tn + t1.tn + t2.tn + t3.tn) * nqv.nq) AS approx
       |  FROM aq0 a0
       |  JOIN aq1 a1 USING (vec_id)
       |  JOIN aq2 a2 USING (vec_id)
       |  JOIN aq3 a3 USING (vec_id)
       |  JOIN tb0 t0 ON t0.cluster = a0.cluster
       |  JOIN tb1 t1 ON t1.cluster = a1.cluster
       |  JOIN tb2 t2 ON t2.cluster = a2.cluster
       |  JOIN tb3 t3 ON t3.cluster = a3.cluster$scoresJoin, nqv
       |  $scoresWhere),
       |short AS (SELECT vec_id FROM scores ORDER BY approx DESC, vec_id LIMIT 50),
       |nqe AS (
       |  SELECT sqrt(${dotSql("qe", "qe")}) AS nrm
       |  FROM q, generate_series(1, 64) g(i)),
       |ne AS (
       |  SELECT vec_id, sqrt(${dotSql("embedding", "embedding")}) AS nrm
       |  FROM embeddings, generate_series(1, 64) g(i) GROUP BY vec_id)""".stripMargin
  }
}
