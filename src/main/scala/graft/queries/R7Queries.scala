package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.Similarity

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
           |FROM approx JOIN exact USING (vec_id)""".stripMargin))
  )
}
