package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.{Retrieval, Similarity}

/** Round-8 session queries: incremental maintenance for the COMPRESSED
  * vector index (the last rebuild-only family — VERDICT r7 ask #1/#5),
  * the recall-vs-nprobe sweep gate (#3), the generic N-stage funnel
  * (#4) and MMR diversity re-ranking (#6).
  */
object R9Queries {

  /** The BASE-slice-trained IVFADC quantizer pair (coarse centroids +
    * residual codebooks over `vec_id % 4 <> 1`), memoized per dataset
    * dir — the R8Queries one-training-many-consumers memo for the
    * append-family queries: sim_ivfadc_append and stream_ivfadc build
    * the same batch-0 layout, so they share one training.
    */
  private val baseCoarseCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[Seq[Double]]]()
  private val baseBooksCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[Seq[Seq[Double]]]]()

  private[queries] def baseSlice(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.embeddings(s, d).filter(col("vec_id") % 4 =!= 1)

  private[queries] def baseCoarse(s: org.apache.spark.sql.SparkSession,
                         d: String): Seq[Seq[Double]] =
    baseCoarseCache.computeIfAbsent(d, _ => Similarity.kmeansQuantized(
      baseSlice(s, d), "vec_id", "embedding", 4, 1))

  private[queries] def baseBooks(s: org.apache.spark.sql.SparkSession,
                        d: String): Seq[Seq[Seq[Double]]] =
    baseBooksCache.computeIfAbsent(d, _ => Similarity.residualBooks(
      baseSlice(s, d), "vec_id", "embedding", baseCoarse(s, d), 4, 8, 1, 64))

  /** The shared oracle for every "train on the base slice, serve the
    * union" IVFADC layout: the parameterized ADC chain with coarse +
    * codebook training restricted to `vec_id % 4 <> 1`, full-corpus
    * assignment/encoding, and the exact rescore tail.
    */
  private lazy val adcAppendOracle: String =
    s"""WITH tr AS (
       |  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 4 <> 1),
       |${R8Queries.ivfAdcChainOn("tr", Some("vec_id % 4 <> 1"))},
       |${R8Queries.rescoreTail}""".stripMargin

  val all: Seq[Q] = Seq(

    Q("sim_ivfadc_append",
      "Frozen-quantizer batch append for the IVFADC at-rest layout — " +
        "the FAISS add path that closes the last rebuild-only " +
        "maintenance family: the layout trains coarse centroids + " +
        "residual codebooks on the base slice (vec_id % 4 <> 1) and " +
        "writes it as batch 0; the held-out quarter is then ENCODED " +
        "with the PERSISTED quantizer pair (no retraining, no rewrite " +
        "— per-ingest cost is the batch) and appended as batch 1 under " +
        "the shared commit-marker state machine; the probe serves the " +
        "union through partition-pruned, code-only ADC scans. The " +
        "oracle trains the full unrolled chain on the same base slice " +
        "and assigns/encodes/probes the FULL corpus — exactly the " +
        "union the two committed batches form.",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val rest = emb.filter(col("vec_id") % 4 === 1)
        val qv = Similarity.vectorOf(emb, "vec_id", "embedding", 0L)
        val path = sys.props.getOrElse("java.io.tmpdir", "/tmp") +
          "/graft_ivfadc_append_" + d.replaceAll("[^A-Za-z0-9.]", "_")
        Similarity.ivfAdcWriteLayout(baseSlice(s, d), "vec_id", "embedding",
          path, kCoarse = 4, coarseIters = 1, m = 4, k = 8, iters = 1,
          dims = 64, trainedCoarse = Some(baseCoarse(s, d)),
          trainedBooks = Some(baseBooks(s, d)))
        Similarity.ivfAdcAppendLayout(rest, "vec_id", "embedding", path,
          batchId = 1L)
        Similarity.ivfAdcProbeLayout(s, path, qv, k = 10, nprobe = 2,
          rescore = 50)
      },
      Some(adcAppendOracle)),

    Q("stream_ivfadc",
      "Structured Streaming maintains the COMPRESSED at-rest index: " +
        "the base slice bootstraps the IVFADC layout (quantizer pair + " +
        "batch 0); the embedding file stream then appends the held-out " +
        "quarter via foreachBatch + ivfAdcAppendLayout — each " +
        "micro-batch ENCODED with the persisted frozen quantizers " +
        "under the micro-batch id. A failed micro-batch replays under " +
        "the SAME id and the append retry rewrites exactly its own " +
        "batch subtree — exactly-once maintenance of a compressed " +
        "vector index. Serving the streamed layout == one encode pass " +
        "over the union, so the sim_ivfadc_append oracle applies " +
        "verbatim.",
      (s, d) => {
        val path = graft.streaming.EventStream.runIvfAdcIngestStream(
          s, d,
          sys.props.getOrElse("java.io.tmpdir", "/tmp") +
            "/graft_stream_ivfadc_" + d.replaceAll("[^A-Za-z0-9.]", "_"),
          kCoarse = 4, coarseIters = 1, m = 4, k = 8, iters = 1, dims = 64,
          trainedCoarse = Some(baseCoarse(s, d)),
          trainedBooks = Some(baseBooks(s, d)))
        val qv = Similarity.vectorOf(Tables.embeddings(s, d),
          "vec_id", "embedding", 0L)
        Similarity.ivfAdcProbeLayout(s, path, qv, k = 10, nprobe = 2,
          rescore = 50)
      },
      Some(adcAppendOracle)),

    Q("sim_recall_sweep",
      "The recall-vs-nprobe CURVE over the at-rest IVF layout in ONE " +
        "pass — the relation an index tuner needs (the per-index gates " +
        "pin one operating point; this emits the whole curve): the " +
        "clusters x anchors shortlist is ranked once to max(nprobe), " +
        "ONE scan pruned to the union of probed partitions scores " +
        "candidates tagged with their cluster's shortlist rank, a " +
        "TopKByKey bounds everything after one exchange to anchors x " +
        "maxNprobe x k rows (union-of-tiers top-k must be top-k within " +
        "its own tier), and each operating point is a rank filter over " +
        "that same bounded relation vs ONE exact ground truth. Three " +
        "operating points (nprobe 1, 2, 4) cost one probe scan + one " +
        "ground-truth scan, never a scan per point.",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val path = sys.props.getOrElse("java.io.tmpdir", "/tmp") +
          "/graft_ivf_sweep_" + d.replaceAll("[^A-Za-z0-9.]", "_")
        Similarity.ivfWriteLayout(emb, "vec_id", "embedding", path,
          kClusters = R5Queries.K, iters = R5Queries.ITERS)
        Similarity.ivfRecallSweepLayout(s, path, Seq(0L, 1L, 2L, 3L),
          k = 10, nprobes = Seq(1, 2, 4))
      },
      Some {
        val aFinal = s"a${R5Queries.ITERS + 1}"
        def dotSql(a: String, b: String): String =
          s"cast(sum(cast($a[i]::DOUBLE * $b[i]::DOUBLE AS DECIMAL(38,14))) AS DOUBLE)"
        s"""WITH ${R5Queries.kmeansCtesOn("embeddings")},
           |anchors AS (
           |  SELECT vec_id AS anchor_id, embedding AS ae FROM embeddings
           |  WHERE vec_id IN (0, 1, 2, 3)),
           |na AS (
           |  SELECT anchor_id, greatest(sqrt(${dotSql("ae", "ae")}), 1e-30) AS nrm
           |  FROM anchors, generate_series(1, 64) g(i) GROUP BY anchor_id),
           |ne AS (
           |  SELECT vec_id,
           |    greatest(sqrt(${dotSql("embedding", "embedding")}), 1e-30) AS nrm
           |  FROM embeddings, generate_series(1, 64) g(i) GROUP BY vec_id),
           |adots AS (
           |  SELECT a.anchor_id, e.vec_id, ${dotSql("e.embedding", "a.ae")} AS dot
           |  FROM embeddings e CROSS JOIN anchors a,
           |       generate_series(1, 64) g(i)
           |  GROUP BY a.anchor_id, e.vec_id),
           |cdot AS (
           |  SELECT a.anchor_id, c.cluster,
           |    cast(sum(cast(c.c * a.ae[c.i]::DOUBLE AS DECIMAL(38,14))) AS DOUBLE) AS dot,
           |    sqrt(cast(sum(cast(c.c * c.c AS DECIMAL(38,14))) AS DOUBLE)) AS cn
           |  FROM c${R5Queries.ITERS} c CROSS JOIN anchors a
           |  GROUP BY a.anchor_id, c.cluster),
           |shortr AS (
           |  SELECT anchor_id, cluster,
           |    row_number() OVER (PARTITION BY anchor_id
           |      ORDER BY dot / (cn * na.nrm) DESC, cluster) AS crn
           |  FROM cdot JOIN na USING (anchor_id)),
           |pts AS (SELECT unnest([1, 2, 4]) AS nprobe),
           |exact AS (
           |  SELECT anchor_id, vec_id FROM (
           |    SELECT d.anchor_id, d.vec_id,
           |      row_number() OVER (PARTITION BY d.anchor_id
           |        ORDER BY d.dot / (ne.nrm * na.nrm) DESC, d.vec_id) AS rn
           |    FROM adots d JOIN ne USING (vec_id) JOIN na USING (anchor_id))
           |  WHERE rn <= 10),
           |approx AS (
           |  SELECT nprobe, anchor_id, vec_id FROM (
           |    SELECT p.nprobe, d.anchor_id, d.vec_id,
           |      row_number() OVER (PARTITION BY d.anchor_id, p.nprobe
           |        ORDER BY d.dot / (ne.nrm * na.nrm) DESC, d.vec_id) AS rn
           |    FROM adots d JOIN ne USING (vec_id) JOIN na USING (anchor_id)
           |         JOIN $aFinal ass USING (vec_id)
           |         JOIN shortr s ON s.anchor_id = d.anchor_id
           |                     AND s.cluster = ass.cluster
           |         CROSS JOIN pts p
           |    WHERE s.crn <= p.nprobe)
           |  WHERE rn <= 10),
           |hits AS (
           |  SELECT nprobe, anchor_id, count(*) AS h
           |  FROM approx JOIN exact USING (anchor_id, vec_id)
           |  GROUP BY nprobe, anchor_id),
           |den AS (SELECT anchor_id, count(*) AS n FROM exact GROUP BY anchor_id)
           |SELECT p.nprobe, CAST(10 AS BIGINT) AS k,
           |  count(*) AS n_anchors,
           |  cast(sum(cast(coalesce(h.h, 0)::DOUBLE / den.n
           |    AS DECIMAL(38,14))) AS DOUBLE) / count(*) AS mean_recall
           |FROM pts p CROSS JOIN den
           |LEFT JOIN hits h ON h.nprobe = p.nprobe AND h.anchor_id = den.anchor_id
           |GROUP BY p.nprobe
           |ORDER BY p.nprobe""".stripMargin
      }),

    Q("ev_funnel_n",
      "The generic N-stage funnel at N = 5 — signup -> view -> click -> " +
        "view -> purchase (a REPEATED stage: the second view must " +
        "strictly follow the click, which a per-type min-ts chain can " +
        "only express with one join per stage) — served by the Funnel " +
        "operator in ONE hash exchange on user_id: per-user sorted " +
        "event lists, the greedy earliest-match chain as an in-row left " +
        "fold, per-stage counts as one conditional 1-row aggregate. " +
        "The oracle unrolls the equivalent five-stage min-ts join " +
        "chain, which the greedy fold provably matches stage by stage.",
      (s, d) => graft.ops.Funnel.funnel(Tables.events(s, d),
        "user_id", "ts", "event_type",
        Seq("signup", "view", "click", "view", "purchase")),
      Some("""WITH s1 AS (
             |  SELECT user_id, min(ts) AS t FROM events
             |  WHERE event_type = 'signup' GROUP BY 1),
             |s2 AS (
             |  SELECT e.user_id, min(e.ts) AS t
             |  FROM events e JOIN s1 USING (user_id)
             |  WHERE e.event_type = 'view' AND e.ts > s1.t GROUP BY 1),
             |s3 AS (
             |  SELECT e.user_id, min(e.ts) AS t
             |  FROM events e JOIN s2 USING (user_id)
             |  WHERE e.event_type = 'click' AND e.ts > s2.t GROUP BY 1),
             |s4 AS (
             |  SELECT e.user_id, min(e.ts) AS t
             |  FROM events e JOIN s3 USING (user_id)
             |  WHERE e.event_type = 'view' AND e.ts > s3.t GROUP BY 1),
             |s5 AS (
             |  SELECT e.user_id, min(e.ts) AS t
             |  FROM events e JOIN s4 USING (user_id)
             |  WHERE e.event_type = 'purchase' AND e.ts > s4.t GROUP BY 1)
             |SELECT * FROM (
             |  SELECT 1 AS stage_idx, 'signup' AS stage,
             |         (SELECT count(*) FROM s1) AS n_users
             |  UNION ALL SELECT 2, 'view', (SELECT count(*) FROM s2)
             |  UNION ALL SELECT 3, 'click', (SELECT count(*) FROM s3)
             |  UNION ALL SELECT 4, 'view', (SELECT count(*) FROM s4)
             |  UNION ALL SELECT 5, 'purchase', (SELECT count(*) FROM s5))
             |ORDER BY stage_idx""".stripMargin)),

    Q("ta_mmr",
      "MMR diversity re-rank (Carbonell & Goldstein 1998) over the " +
        "hybrid-retrieval shortlist: greedily pick 5 of the 10 " +
        "RRF-fused candidates maximizing 0.5*rrf_score - 0.5*max " +
        "cosine to the already-selected set (ties to the lower id) — " +
        "the diversity pass a RAG stack runs so near-identical chunks " +
        "don't crowd out the second topic. The expensive work is the " +
        "two retrievals (already bounded top-k); the re-rank is a k x k " +
        "exact-decimal cosine matrix and a driver-side greedy over it. " +
        "The oracle unrolls the same greedy as a five-step CTE chain " +
        "over the shared sparse/dense/fused CTEs, so the re-rank can " +
        "never drift from the fusion it consumes.",
      (s, d) => {
        val sparse = Retrieval.rankBounded(
          Retrieval.bm25(Tables.documents(s, d), "doc_id", "text",
            Seq("dup", "spark", "vector"), topK = 15), "doc_id", "score")
        val emb = Tables.embeddings(s, d)
        val qv = Similarity.vectorOf(emb, "vec_id", "embedding", 0L)
        val dense = Retrieval.rankBounded(
          Similarity.bruteForceTopK(emb, "vec_id", "embedding", qv, 15)
            .withColumnRenamed("vec_id", "doc_id"), "doc_id", "cos_sim")
        val fused = Retrieval.rrfFuse(sparse, dense, "doc_id",
          rrfK = 60, topK = 10)
        Retrieval.mmrRerank(fused.select(col("doc_id"), col("rrf_score")),
          "doc_id", "rrf_score", emb, "vec_id", "embedding",
          k = 5, lambda = 0.5)
      },
      Some {
        def dotSql(a: String, b: String): String =
          s"cast(sum(cast($a[i]::DOUBLE * $b[i]::DOUBLE AS DECIMAL(38,14))) AS DOUBLE)"
        // steps 2..5 of the greedy, each picking the argmax of
        // mmr = 0.5·rel − 0.5·max(sim to selected) over the rest
        val steps = (2 to 5).map { i =>
          s"""sel$i AS (
             |  SELECT CAST($i AS BIGINT) AS rank, c.doc_id, c.rrf_score,
             |    0.5::DOUBLE * c.rrf_score - 0.5::DOUBLE * (
             |      SELECT max(s.sim) FROM sims s
             |      JOIN selu${i - 1} t ON s.idb = t.doc_id
             |      WHERE s.ida = c.doc_id) AS mmr_score
             |  FROM fused c
             |  WHERE c.doc_id NOT IN (SELECT doc_id FROM selu${i - 1})
             |  ORDER BY mmr_score DESC, c.doc_id LIMIT 1),
             |selu$i AS (SELECT * FROM selu${i - 1} UNION ALL SELECT * FROM sel$i)""".stripMargin
        }.mkString("," + "\n")
        s"""WITH ${R8Queries.sparseCtes(15)},
           |${R8Queries.denseCtes(15)},
           |fused AS (
           |  SELECT coalesce(s.doc_id, dn.vec_id) AS doc_id,
           |    coalesce(1.0 / (cast(60 AS DOUBLE) + cast(rank_a AS DOUBLE)), 0.0) +
           |    coalesce(1.0 / (cast(60 AS DOUBLE) + cast(rank_b AS DOUBLE)), 0.0)
           |      AS rrf_score
           |  FROM sparse s FULL OUTER JOIN dense dn ON s.doc_id = dn.vec_id
           |  ORDER BY rrf_score DESC, doc_id
           |  LIMIT 10),
           |cvec AS (
           |  SELECT f.doc_id, e.embedding
           |  FROM fused f LEFT JOIN embeddings e ON e.vec_id = f.doc_id),
           |cnrm AS (
           |  SELECT doc_id,
           |    greatest(sqrt(${dotSql("embedding", "embedding")}), 1e-30) AS nrm
           |  FROM cvec, generate_series(1, 64) g(i)
           |  WHERE embedding IS NOT NULL GROUP BY doc_id),
           |pdots AS (
           |  SELECT a.doc_id AS ida, b.doc_id AS idb,
           |    ${dotSql("a.embedding", "b.embedding")} AS dot
           |  FROM cvec a, cvec b, generate_series(1, 64) g(i)
           |  WHERE a.embedding IS NOT NULL AND b.embedding IS NOT NULL
           |  GROUP BY a.doc_id, b.doc_id),
           |sims AS (
           |  SELECT a.doc_id AS ida, b.doc_id AS idb,
           |    coalesce(p.dot / (na.nrm * nb.nrm), 0.0::DOUBLE) AS sim
           |  FROM cvec a CROSS JOIN cvec b
           |  LEFT JOIN pdots p ON p.ida = a.doc_id AND p.idb = b.doc_id
           |  LEFT JOIN cnrm na ON na.doc_id = a.doc_id
           |  LEFT JOIN cnrm nb ON nb.doc_id = b.doc_id),
           |sel1 AS (
           |  SELECT CAST(1 AS BIGINT) AS rank, doc_id, rrf_score,
           |    0.5::DOUBLE * rrf_score - 0.5::DOUBLE * 0.0::DOUBLE AS mmr_score
           |  FROM fused ORDER BY mmr_score DESC, doc_id LIMIT 1),
           |selu1 AS (SELECT * FROM sel1),
           |$steps
           |SELECT rank, doc_id, rrf_score, mmr_score FROM selu5
           |ORDER BY rank""".stripMargin
      })
  )
}
