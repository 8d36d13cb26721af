package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.{Curation, Dedup, LmSignals, Similarity, TextAnalysis}

/** Round-7 session queries, closing the VERDICT r6 asks:
  *
  *  - `sim_ivf_append` puts the IVF layout's INCREMENTAL maintenance
  *    under the DuckDB gate: build on a subset, append the rest as a
  *    `batch=1` write against the persisted centroids (no retraining,
  *    no table rewrite), probe the union — the `Retrieval.appendToIndex`
  *    idempotent-batch pattern applied to the vector index;
  *  - `sim_recall_batch` extends the single-anchor recall gate to an
  *    anchor BATCH (mean recall@k over several query vectors — one
  *    atypical anchor can no longer hide a bad index region), and
  *    `sim_recall_lsh` / `sim_recall_quant` gate the two ANN variants
  *    that shipped ungated in r6.
  */
object R7Queries {

  /** DuckDB restatement of Dedup.dotExact over index i (1-based). */
  private def dotSql(a: String, b: String): String =
    s"cast(sum(cast($a[i]::DOUBLE * $b[i]::DOUBLE AS DECIMAL(38,14))) AS DOUBLE)"

  private val RecallAnchors = Seq(0L, 1L, 2L, 3L)

  /** ExtQueries.minhashPairCtes generalized to any (relation, text
    * column) — the pretraining pipeline runs MinHash over the
    * quality-gated, span-deduped relation, not raw `documents`. Emits
    * `sig/bands/bf/pairs` CTEs (2 bands × 3 rows over word 5-gram
    * shingles, band-df cap 256 — the Dedup.minhashCandidates mirror).
    */
  private def minhashPairCtesOn(rel: String, c: String): String = {
    def slice(i: Int) = s"substr(md5(s), ${i * 5 + 1}, 5)"
    val mhs = (0 until 6).map(i =>
      s"list_min(list_transform(${ExtQueries.wordShingleSqlPub(c, 5)}, s -> ${slice(i)})) AS mh$i")
      .mkString(",\n    ")
    val bands = (0 until 2).map(b =>
      s"SELECT doc_id, $b AS band, mh${3 * b} || mh${3 * b + 1} || mh${3 * b + 2} AS h FROM sig")
      .mkString("\n  UNION ALL ")
    s"""sig AS (
       |  SELECT doc_id,
       |    $mhs
       |  FROM $rel),
       |bands AS (
       |  $bands),
       |bf AS (
       |  SELECT doc_id, band, h, count(*) OVER (PARTITION BY band, h) AS df_b
       |  FROM bands),
       |pairs AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.band
       |  FROM bf a JOIN bf b
       |    ON a.band = b.band AND a.h = b.h AND a.doc_id < b.doc_id
       |  WHERE a.df_b <= 256
       |  UNION ALL
       |  SELECT id_a, id_b, band FROM (
       |    SELECT doc_id AS id_a,
       |           lead(doc_id) OVER (PARTITION BY band, h ORDER BY doc_id) AS id_b,
       |           band
       |    FROM bf WHERE df_b > 256)
       |  WHERE id_b IS NOT NULL)""".stripMargin
  }

  /** The ta_quality quality-score expression over a text column `c`,
    * emitted as a scalar SQL expression (the established feature mix:
    * length, punctuation ratio, stopword ratio).
    */
  private[queries] def qualitySql(c: String): String =
    s"""(least(length($c) / 500.0::DOUBLE, 1.0::DOUBLE) * 0.4::DOUBLE
       |  + (1.0::DOUBLE -
       |     CASE WHEN length($c) = 0 THEN 0.0::DOUBLE
       |          ELSE length(regexp_replace($c, '[A-Za-z0-9\\s]', '', 'g'))
       |               / length($c) END) * 0.3::DOUBLE
       |  + least((CASE WHEN (CASE WHEN trim($c) = '' THEN 0
       |                 ELSE len(string_split_regex(trim($c), '\\s+')) END) = 0
       |           THEN 0.0::DOUBLE
       |           ELSE (((length($c) - length(replace($c, ' the ', ''))) / 5::DOUBLE
       |                  + (length($c) - length(replace($c, ' a ', ''))) / 3::DOUBLE))
       |                / (CASE WHEN trim($c) = '' THEN 0
       |                   ELSE len(string_split_regex(trim($c), '\\s+')) END) END)
       |          * 4.0::DOUBLE, 1.0::DOUBLE) * 0.3::DOUBLE)""".stripMargin

  val all: Seq[Q] = Seq(

    Q("sim_ivf_append",
      "Incremental append for the at-rest IVF layout: ivfWriteLayout " +
        "trains on vec_id % 4 <> 1 and writes it as batch 0; the " +
        "held-out quarter is appended as batch 1 ASSIGNED WITH THE " +
        "PERSISTED CENTROIDS (no retraining, no rewrite — per-ingest " +
        "cost is the batch, not the table); the probe serves the union " +
        "via partition-pruned scan. The oracle trains Lloyd on the same " +
        "subset (unrolled CTEs) and assigns/probes the FULL corpus — " +
        "exactly the union the two committed batches form.",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val base = emb.filter(col("vec_id") % 4 =!= 1)
        val rest = emb.filter(col("vec_id") % 4 === 1)
        val q = Similarity.vectorOf(emb, "vec_id", "embedding", 0L)
        val path = sys.props.getOrElse("java.io.tmpdir", "/tmp") +
          "/graft_ivf_append_" + d.replaceAll("[^A-Za-z0-9.]", "_")
        Similarity.ivfWriteLayout(base, "vec_id", "embedding", path,
          kClusters = R5Queries.K, iters = R5Queries.ITERS)
        Similarity.ivfAppendLayout(rest, "vec_id", "embedding", path,
          batchId = 1L)
        Similarity.ivfProbeLayout(s, path, q, k = 10, nprobe = 2)
      },
      Some(
        s"""WITH tr AS (
           |  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 4 <> 1),
           |${R5Queries.kmeansCtesOn("tr")},
           |${R5Queries.ivfProbeCtes(nprobe = 2)}
           |SELECT d.vec_id, d.dot / (ne.nrm * nq.nrm) AS cos_sim
           |FROM dots d JOIN ne USING (vec_id)
           |     JOIN a${R5Queries.ITERS + 1} ass USING (vec_id), nq
           |WHERE ass.cluster IN (SELECT cluster FROM short)
           |ORDER BY cos_sim DESC, d.vec_id
           |LIMIT 10""".stripMargin)),

    Q("sim_recall_batch",
      "Mean recall@10 of the trained IVF over a 4-anchor batch — the " +
        "r6 gate ran one query vector, which can hide a bad index " +
        "region. ONE training, ONE assignment pass, per-anchor nprobe " +
        "shortlists on the tiny clusters×anchors relation, exact ground " +
        "truth via the broadcast-anchor TopKByKey scan (the sim_hardneg " +
        "shape), per-anchor recall joined per (anchor, id), mean as a " +
        "decimal-exact sum. The oracle replays the Lloyd chain, all " +
        "four probes, the exact rankings and the mean.",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val exact = Similarity.bruteForceTopKBatch(emb, "vec_id",
          "embedding", RecallAnchors, k = 10)
        val approx = Similarity.ivfTrainedTopKBatch(emb, "vec_id",
          "embedding", RecallAnchors, k = 10, nprobe = 2,
          kClusters = R5Queries.K, iters = R5Queries.ITERS)
        Similarity.recallAtKBatch(exact, approx, "anchor_id", "vec_id", 10)
      },
      Some {
        val aFinal = s"a${R5Queries.ITERS + 1}"
        val ids = RecallAnchors.mkString(", ")
        s"""WITH ${R5Queries.kmeansCtesOn("embeddings")},
           |anchors AS (
           |  SELECT vec_id AS anchor_id, embedding AS ae FROM embeddings
           |  WHERE vec_id IN ($ids)),
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
           |short AS (
           |  SELECT anchor_id, cluster FROM cdot JOIN na USING (anchor_id)
           |  QUALIFY row_number() OVER (PARTITION BY anchor_id
           |    ORDER BY dot / (cn * na.nrm) DESC, cluster) <= 2),
           |exact AS (
           |  SELECT anchor_id, vec_id FROM (
           |    SELECT d.anchor_id, d.vec_id,
           |      row_number() OVER (PARTITION BY d.anchor_id
           |        ORDER BY d.dot / (ne.nrm * na.nrm) DESC, d.vec_id) AS rn
           |    FROM adots d JOIN ne USING (vec_id) JOIN na USING (anchor_id))
           |  WHERE rn <= 10),
           |approx AS (
           |  SELECT anchor_id, vec_id FROM (
           |    SELECT d.anchor_id, d.vec_id,
           |      row_number() OVER (PARTITION BY d.anchor_id
           |        ORDER BY d.dot / (ne.nrm * na.nrm) DESC, d.vec_id) AS rn
           |    FROM adots d JOIN ne USING (vec_id) JOIN na USING (anchor_id)
           |         JOIN $aFinal ass USING (vec_id)
           |         JOIN short s ON s.anchor_id = d.anchor_id
           |                    AND s.cluster = ass.cluster)
           |  WHERE rn <= 10),
           |hits AS (
           |  SELECT anchor_id, count(*) AS h
           |  FROM approx JOIN exact USING (anchor_id, vec_id)
           |  GROUP BY anchor_id),
           |per AS (
           |  SELECT en.anchor_id,
           |    coalesce(h, 0)::DOUBLE / en.n AS r
           |  FROM (SELECT anchor_id, count(*) AS n FROM exact
           |        GROUP BY anchor_id) en
           |  LEFT JOIN hits USING (anchor_id))
           |SELECT CAST(10 AS BIGINT) AS k, count(*) AS n_anchors,
           |  cast(sum(cast(r AS DECIMAL(38,14))) AS DOUBLE) / count(*)
           |    AS mean_recall
           |FROM per""".stripMargin
      }),

    Q("sim_recall_lsh",
      "Recall@10 gate for the SRP-LSH index (ungated in r6): exact " +
        "brute force vs the one-bucket probe, intersected — the " +
        "evaluation that tells you whether 4 planes / 16 buckets is " +
        "enough structure for this corpus or the probe needs " +
        "Hamming-adjacent buckets. Oracle replays planes, signs, the " +
        "bucket filter, both rankings and the intersection.",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val q = Similarity.vectorOf(emb, "vec_id", "embedding", 0L)
        val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 10)
        val approx = Similarity.srpTopK(emb, "vec_id", "embedding", q,
          k = 10, nPlanes = 4)
        Similarity.recallAtK(exact, approx, "vec_id", 10)
      },
      Some(
        s"""WITH planes AS (
           |  SELECT j, i,
           |    ((instr('0123456789abcdef', substr(md5(j || '_' || i), 1, 1)) - 9)::DOUBLE
           |      / 16.0::DOUBLE) AS w
           |  FROM generate_series(0, 3) t(j), generate_series(1, 64) g(i)),
           |sigs AS (
           |  SELECT e.vec_id, p.j,
           |    cast(sum(cast(e.embedding[p.i]::DOUBLE * p.w AS DECIMAL(30,14))) AS DOUBLE) AS dot
           |  FROM embeddings e, planes p
           |  GROUP BY e.vec_id, p.j),
           |buckets AS (
           |  SELECT vec_id,
           |    sum(CASE WHEN dot >= 0 THEN 1::BIGINT << j ELSE 0 END) AS bucket
           |  FROM sigs GROUP BY vec_id),
           |qbucket AS (SELECT bucket FROM buckets WHERE vec_id = 0),
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
           |  FROM dots d JOIN ne USING (vec_id)
           |       JOIN buckets b ON d.vec_id = b.vec_id, nq, qbucket
           |  WHERE b.bucket = qbucket.bucket
           |  ORDER BY d.dot / (ne.nrm * nq.nrm) DESC, d.vec_id LIMIT 10)
           |SELECT CAST(10 AS BIGINT) AS k,
           |  count(*) AS hits,
           |  CASE WHEN (SELECT count(*) FROM exact) > 0
           |    THEN CAST(count(*) AS DOUBLE) /
           |         (SELECT count(*) FROM exact)
           |    ELSE 0.0 END AS recall
           |FROM approx JOIN exact USING (vec_id)""".stripMargin)),

    Q("sim_recall_quant",
      "Recall@10 gate for the int8-quantized index (ungated in r6): " +
        "exact brute force vs quantize → integer-cosine shortlist(50) → " +
        "exact rescore → top-10, intersected. A recall drop here means " +
        "the rescore budget is too small for the quantization noise.",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val q = Similarity.vectorOf(emb, "vec_id", "embedding", 0L)
        val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 10)
        val approx = Similarity.quantTopK(emb, "vec_id", "embedding",
          queryId = 0L, k = 10, rescore = 50)
        Similarity.recallAtK(exact, approx, "vec_id", 10)
      },
      Some(
        s"""WITH sc AS (
           |  SELECT vec_id,
           |    greatest(max(abs(embedding[i]::DOUBLE)), 1e-30) / 127 AS scale
           |  FROM embeddings, generate_series(1, 64) g(i) GROUP BY vec_id),
           |qv AS (
           |  SELECT e.vec_id, i,
           |    CAST(round(e.embedding[i]::DOUBLE / s.scale) AS BIGINT) AS q
           |  FROM embeddings e JOIN sc s USING (vec_id),
           |       generate_series(1, 64) g(i)),
           |qq AS (SELECT i, q FROM qv WHERE vec_id = 0),
           |qnn AS (SELECT CAST(sum(q * q) AS BIGINT) AS n FROM qq),
           |qd AS (
           |  SELECT a.vec_id, CAST(sum(a.q * b.q) AS BIGINT) AS dab,
           |         CAST(sum(a.q * a.q) AS BIGINT) AS daa
           |  FROM qv a JOIN qq b USING (i) GROUP BY a.vec_id),
           |short AS (
           |  SELECT vec_id,
           |    dab::DOUBLE / (sqrt(daa::DOUBLE) *
           |      sqrt((SELECT n FROM qnn)::DOUBLE)) AS approx_sim
           |  FROM qd WHERE daa > 0
           |  ORDER BY approx_sim DESC, vec_id LIMIT 50),
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

    Q("sim_lsh_multiprobe",
      "Multi-probe SRP-LSH (Hamming radius 1): the recall lever the " +
        "sim_recall_lsh gate demands — single-bucket recall measured " +
        "0.40, so the probe expands to the 5 buckets within one flipped " +
        "sign bit. The probe set enumerates DRIVER-side into an isin " +
        "literal list (partition-prunable on a bucket-partitioned " +
        "layout, unlike an in-plan bit_count filter); the query's own " +
        "bucket is a 1-row evaluation of the same decimal-exact sign " +
        "expression the corpus side uses.",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val q = Similarity.vectorOf(emb, "vec_id", "embedding", 0L)
        Similarity.srpTopKMultiProbe(emb, "vec_id", "embedding", q,
          k = 10, nPlanes = 4, hamming = 1)
      },
      Some(
        s"""WITH planes AS (
           |  SELECT j, i,
           |    ((instr('0123456789abcdef', substr(md5(j || '_' || i), 1, 1)) - 9)::DOUBLE
           |      / 16.0::DOUBLE) AS w
           |  FROM generate_series(0, 3) t(j), generate_series(1, 64) g(i)),
           |sigs AS (
           |  SELECT e.vec_id, p.j,
           |    cast(sum(cast(e.embedding[p.i]::DOUBLE * p.w AS DECIMAL(30,14))) AS DOUBLE) AS dot
           |  FROM embeddings e, planes p
           |  GROUP BY e.vec_id, p.j),
           |buckets AS (
           |  SELECT vec_id,
           |    sum(CASE WHEN dot >= 0 THEN 1::BIGINT << j ELSE 0 END) AS bucket
           |  FROM sigs GROUP BY vec_id),
           |qbucket AS (SELECT bucket FROM buckets WHERE vec_id = 0),
           |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
           |nq AS (
           |  SELECT sqrt(${dotSql("qe", "qe")}) AS nrm
           |  FROM q, generate_series(1, 64) g(i)),
           |members AS (
           |  SELECT e.vec_id, e.embedding
           |  FROM embeddings e JOIN buckets b ON e.vec_id = b.vec_id, qbucket
           |  WHERE bit_count(xor(b.bucket::BIGINT, qbucket.bucket::BIGINT)) <= 1),
           |ne AS (
           |  SELECT vec_id, sqrt(${dotSql("embedding", "embedding")}) AS nrm
           |  FROM members, generate_series(1, 64) g(i) GROUP BY vec_id),
           |dots AS (
           |  SELECT e.vec_id, ${dotSql("e.embedding", "q.qe")} AS dot
           |  FROM members e, q, generate_series(1, 64) g(i)
           |  GROUP BY e.vec_id)
           |SELECT d.vec_id, d.dot / (ne.nrm * nq.nrm) AS cos_sim
           |FROM dots d JOIN ne ON d.vec_id = ne.vec_id, nq
           |ORDER BY cos_sim DESC, d.vec_id
           |LIMIT 10""".stripMargin)),

    Q("sim_recall_lsh_multi",
      "The multi-probe payoff under the gate: recall@10 of Hamming-1 " +
        "SRP-LSH vs exact brute force — the number that justifies " +
        "probing 5/16 buckets instead of 1/16 (single-probe measured " +
        "0.40).",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val q = Similarity.vectorOf(emb, "vec_id", "embedding", 0L)
        val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 10)
        val approx = Similarity.srpTopKMultiProbe(emb, "vec_id", "embedding",
          q, k = 10, nPlanes = 4, hamming = 1)
        Similarity.recallAtK(exact, approx, "vec_id", 10)
      },
      Some(
        s"""WITH planes AS (
           |  SELECT j, i,
           |    ((instr('0123456789abcdef', substr(md5(j || '_' || i), 1, 1)) - 9)::DOUBLE
           |      / 16.0::DOUBLE) AS w
           |  FROM generate_series(0, 3) t(j), generate_series(1, 64) g(i)),
           |sigs AS (
           |  SELECT e.vec_id, p.j,
           |    cast(sum(cast(e.embedding[p.i]::DOUBLE * p.w AS DECIMAL(30,14))) AS DOUBLE) AS dot
           |  FROM embeddings e, planes p
           |  GROUP BY e.vec_id, p.j),
           |buckets AS (
           |  SELECT vec_id,
           |    sum(CASE WHEN dot >= 0 THEN 1::BIGINT << j ELSE 0 END) AS bucket
           |  FROM sigs GROUP BY vec_id),
           |qbucket AS (SELECT bucket FROM buckets WHERE vec_id = 0),
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
           |  FROM dots d JOIN ne USING (vec_id)
           |       JOIN buckets b ON d.vec_id = b.vec_id, nq, qbucket
           |  WHERE bit_count(xor(b.bucket::BIGINT, qbucket.bucket::BIGINT)) <= 1
           |  ORDER BY d.dot / (ne.nrm * nq.nrm) DESC, d.vec_id LIMIT 10)
           |SELECT CAST(10 AS BIGINT) AS k,
           |  count(*) AS hits,
           |  CASE WHEN (SELECT count(*) FROM exact) > 0
           |    THEN CAST(count(*) AS DOUBLE) /
           |         (SELECT count(*) FROM exact)
           |    ELSE 0.0 END AS recall
           |FROM approx JOIN exact USING (vec_id)""".stripMargin)),

    Q("pretrain_pipeline",
      "The full pretraining-run flagship — every curation stage a real " +
        "run chains, one driver program with four lineage-cut barriers " +
        "(eager stage barriers at each multi-consumer stage: plain " +
        "caching leaves the whole logical tree for AQE to re-optimize " +
        "at every exchange — measured 15s of driver re-planning vs " +
        "<1s execution at sf0.01; localCheckpoint by default, reliable " +
        "checkpoint-to-dir via the graft.pipeline.reliableBarriers conf " +
        "for long runs; no orchestrator): " +
        "quality gate (>= 0.5 on raw text) → cross-doc SUBSTRING dedup " +
        "(k-gram spans, first occurrence survives) → MinHash-LSH " +
        "near-dup removal (keep-smaller-id pair policy — the lazy " +
        "anti-join; cluster-exact removal is dedup_cluster's driver " +
        "loop) → benchmark decontamination (doc_id % 10 = 0 as the " +
        "held-out eval set, maxBenchDf=8 stop-listing boilerplate " +
        "shingles — the r14 probe measured the unguarded shape " +
        "quadratic, 14.3 GB shuffle at 100x, vs ~50 MB flat capped) → " +
        "DSIR importance filter (target lang='en', " +
        "keep score >= 0) → temperature mixture (alpha 0.5, target " +
        "half) → quality-curriculum buckets → 8 seeded shards → " +
        "128-token sequence packing in curriculum order per shard. " +
        "Output: one row per packed sequence. The oracle replays the " +
        "ENTIRE chain as a single DuckDB WITH pipeline. Exchange audit " +
        "in PLANS.md attributes every shuffle to its named stage.",
      (s, d) => {
        val docs = Tables.documents(s, d)
        // Stage barriers are EAGER lineage cuts, not plain caches: a
        // persist keeps the whole logical tree, and AQE re-optimizes that
        // tree at every one of the chain's ~25 exchanges — measured 15s+
        // of pure driver re-planning at sf0.01 (O(stages × plan size)).
        // The barrier truncates lineage at each multi-consumer stage,
        // so each stage plans against a scan of the (post-filter, small
        // relative to the corpus) previous barrier. Same data, same
        // oracle. Default is localCheckpoint (executor-loss recompute,
        // as in the CC loops); setting Curation.ReliableBarriersKey
        // swaps in reliable checkpoint-to-dir for long runs where a
        // recompute cascade costs more than the replicated write
        // (PipelinesSpec pins reliable ≡ local row-for-row).
        // 1. quality gate on the raw text
        val gated = docs.filter(TextAnalysis.qualityScore(col("text")) >= 0.5)
        // 2. substring dedup; cleaned text replaces the original
        val spans = Dedup.dedupSpans(gated, "doc_id", "text", k = 8, minDocs = 2)
        val cleaned = gated.select(col("doc_id"), col("source"), col("lang"))
          .join(spans.select(col("doc_id"), col("clean_text").as("t")),
            Seq("doc_id"))
          .transform(Curation.stageBarrier)
        // 3. MinHash near-dup removal: drop the larger id of every
        // candidate pair (greedy keep-first; transitive-closure removal
        // needs the CC driver loop — dedup_cluster — when cluster-exact
        // removal matters more)
        val pairs = Dedup.minhashCandidates(cleaned, "doc_id", "t",
          Dedup.Shingler.words(5), bandsN = 2, rowsPerBand = 3)
        val train = cleaned
          .join(pairs.select(col("id_b").as("doc_id")).distinct(),
            Seq("doc_id"), "left_anti")
          .filter(col("doc_id") % 10 =!= 0)
          .transform(Curation.stageBarrier)
        // 4. decontamination against the held-out benchmark slice.
        // The bench here is a FRACTION of the corpus (doc_id % 10), so
        // it grows with the data — the r14 composition probe measured
        // the unguarded join quadratic in that configuration (2.4 MB →
        // 14.3 GB shuffle, 380 s, kept-fraction collapse to 0.4% at
        // 100×). maxBenchDf=8 stop-lists boilerplate shingles shared by
        // many bench docs, bounding join rows per train occurrence at
        // the cap — measured ~50 MB flat across 1×/10×/100× (PLANS.md
        // s3c row), and the capped branch is oracle-bound standalone by
        // `dedup_contamination_capped`.
        val bench = docs.filter(col("doc_id") % 10 === 0)
          .select(col("doc_id"), col("text").as("t"))
        val contaminated = Dedup.contamination(train, bench, "doc_id", "t",
          Dedup.Shingler.words(3), minCommon = 3, maxBenchDf = 8)
        val decon = train.join(
            contaminated.select(col("id").as("doc_id")), Seq("doc_id"),
            "left_anti")
          .transform(Curation.stageBarrier)
        // 5. DSIR importance filter toward the English target
        val dsir = LmSignals.dsirContrast(decon, "doc_id", "t",
          col("lang") === "en")
        val kept = decon.join(
            dsir.filter(col("dsir_score") >= 0).select("doc_id"), Seq("doc_id"))
          .transform(Curation.stageBarrier)
        // 6. temperature mixture over sources
        val mixed = Curation.temperatureMixture(kept, "source", "doc_id",
          alpha = 0.5, targetFrac = 0.5)
        // 7-9. curriculum buckets, seeded shards, packing
        val q = TextAnalysis.qualityScore(col("t"))
        val bucket = when(q >= 0.75, 0).when(q >= 0.5, 1)
          .when(q >= 0.25, 2).otherwise(3)
        val ordKey = concat(col("bucket").cast("string"), lit(":"),
          md5(concat(lit("r7:"), col("doc_id").cast("string"))))
        val sharded = Curation.seededShards(mixed.withColumn("bucket", bucket),
          "doc_id", nShards = 8, seed = "r7")
        Curation.packSequences(sharded.withColumn("__ord", ordKey),
            "shard", "__ord", "t", budget = 128)
          .groupBy(col("shard"), col("seq_id"))
          .agg(count(lit(1)).as("n_docs"),
            sum("n_tokens").as("seq_tokens"),
            min("doc_id").as("first_doc"))
          .orderBy("shard", "seq_id")
      },
      Some(
        s"""WITH gated AS (
           |  SELECT doc_id, source, lang, text FROM documents
           |  WHERE ${qualitySql("text")} >= 0.5),
           |w AS (
           |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws
           |  FROM gated WHERE trim(text) <> ''),
           |g0 AS (
           |  SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 7)) AS i
           |  FROM w WHERE len(ws) >= 8),
           |g AS (
           |  SELECT doc_id, i,
           |         md5(array_to_string(list_slice(ws, i, i + 7), ' ')) AS h
           |  FROM g0),
           |dup AS (
           |  SELECT h, min(doc_id) AS keep_doc FROM g
           |  GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
           |cov AS (
           |  SELECT DISTINCT doc_id, p FROM (
           |    SELECT g.doc_id, unnest(generate_series(g.i, g.i + 7)) AS p
           |    FROM g JOIN dup USING (h)
           |    WHERE g.doc_id <> dup.keep_doc)),
           |wp AS (
           |  SELECT doc_id, unnest(ws) AS word,
           |         unnest(generate_series(1, len(ws))) AS p
           |  FROM w),
           |kw AS (
           |  SELECT wp.doc_id, wp.word, wp.p
           |  FROM wp LEFT JOIN cov ON wp.doc_id = cov.doc_id AND wp.p = cov.p
           |  WHERE cov.p IS NULL),
           |cleaned AS (
           |  SELECT gt.doc_id, gt.source, gt.lang,
           |    coalesce(string_agg(kw.word, ' ' ORDER BY kw.p), '') AS t
           |  FROM gated gt LEFT JOIN kw USING (doc_id)
           |  GROUP BY gt.doc_id, gt.source, gt.lang),
           |${minhashPairCtesOn("cleaned", "t")},
           |train AS (
           |  SELECT * FROM cleaned
           |  WHERE doc_id NOT IN (SELECT id_b FROM pairs)
           |    AND doc_id % 10 <> 0),
           |tsh AS (
           |  SELECT doc_id AS id, unnest(${ExtQueries.wordShingleSqlPub("t", 3)}) AS sh
           |  FROM train),
           |bsh0 AS (
           |  SELECT doc_id AS bid, unnest(${ExtQueries.wordShingleSqlPub("text", 3)}) AS sh
           |  FROM documents WHERE doc_id % 10 = 0),
           |bsh AS (
           |  SELECT bid, sh FROM (
           |    SELECT bid, sh, count(*) OVER (PARTITION BY sh) AS dfb
           |    FROM bsh0)
           |  WHERE dfb <= 8),
           |contaminated AS (
           |  SELECT DISTINCT id FROM (
           |    SELECT id, bid, count(*) AS n FROM tsh JOIN bsh USING (sh)
           |    GROUP BY 1, 2)
           |  WHERE n >= 3),
           |decon AS (
           |  SELECT * FROM train
           |  WHERE doc_id NOT IN (SELECT id FROM contaminated)),
           |tok AS (
           |  SELECT doc_id, is_t, word,
           |         ('0x' || substring(md5(word), 1, 4))::BIGINT AS b
           |  FROM (SELECT doc_id, lang = 'en' AS is_t,
           |               unnest(string_split_regex(trim(t), '\\s+')) AS word
           |        FROM decon)
           |  WHERE word <> ''),
           |hist AS (
           |  SELECT b, sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS ct,
           |         count(*) AS cr
           |  FROM tok GROUP BY b),
           |tot AS (SELECT coalesce(sum(ct), 0) AS tt,
           |               coalesce(sum(cr), 0) AS tr FROM hist),
           |contrast AS (
           |  SELECT b,
           |    (CASE WHEN tt > 0 THEN ct::DOUBLE / tt ELSE 0.0::DOUBLE END
           |     - CASE WHEN tr > 0 THEN cr::DOUBLE / tr ELSE 0.0::DOUBLE END)
           |      AS diff
           |  FROM hist CROSS JOIN tot),
           |scored AS (
           |  SELECT doc_id,
           |    cast(sum(cast(diff AS DECIMAL(38,14))) AS DOUBLE) / count(*)
           |      AS dsir
           |  FROM tok LEFT JOIN contrast USING (b)
           |  GROUP BY doc_id),
           |kept AS (
           |  SELECT d.* FROM decon d LEFT JOIN scored s USING (doc_id)
           |  WHERE coalesce(s.dsir, 0.0::DOUBLE) >= 0),
           |mc AS (SELECT source, count(*) AS n FROM kept GROUP BY source),
           |mt AS (SELECT cast(sum(n) AS DOUBLE) AS nn,
           |              cast(sum(cast(sqrt(cast(n AS DOUBLE)) AS DECIMAL(38,14)))
           |                   AS DOUBLE) AS wsum
           |       FROM mc),
           |mr AS (SELECT mc.source,
           |              least(CAST(1 AS DOUBLE),
           |                    0.5 * mt.nn * sqrt(cast(mc.n AS DOUBLE)) / mt.wsum
           |                      / cast(mc.n AS DOUBLE)) AS rate
           |       FROM mc, mt),
           |mixed AS (
           |  SELECT k2.* FROM kept k2
           |  JOIN mr ON k2.source IS NOT DISTINCT FROM mr.source
           |  WHERE ('0x' || substring(md5(k2.doc_id::VARCHAR), 1, 4))::BIGINT
           |    < mr.rate * 65536),
           |keyed AS (
           |  SELECT doc_id, t,
           |    CASE WHEN ${qualitySql("t")} >= 0.75 THEN 0
           |         WHEN ${qualitySql("t")} >= 0.5 THEN 1
           |         WHEN ${qualitySql("t")} >= 0.25 THEN 2 ELSE 3 END AS bucket,
           |    ('0x' || substring(md5('r7:' || doc_id::VARCHAR), 1, 4))::BIGINT
           |      % 8 AS shard,
           |    CASE WHEN trim(t) = '' THEN 0
           |         ELSE len(string_split_regex(trim(t), '\\s+')) END AS n_tokens
           |  FROM mixed),
           |packed AS (
           |  SELECT shard, doc_id, n_tokens,
           |    sum(n_tokens) OVER (PARTITION BY shard
           |      ORDER BY bucket::VARCHAR || ':' || md5('r7:' || doc_id::VARCHAR)
           |      ROWS UNBOUNDED PRECEDING) - n_tokens AS tok_before
           |  FROM keyed)
           |SELECT shard, CAST(floor(tok_before / 128) AS BIGINT) AS seq_id,
           |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS seq_tokens,
           |  min(doc_id) AS first_doc
           |FROM packed GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))
  )
}
