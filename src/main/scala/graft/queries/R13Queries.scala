package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.{Dedup, Multimodal, Similarity}

/** Round-9 session queries: the IVFADC at-rest LIFECYCLE gate (VERDICT
  * r8 ask #1 — delete/compact/vacuum/as-of on the compressed layout was
  * structural-but-unexercised), plus the rest of the r8 task list as
  * they land.
  */
object R13Queries {

  private def scratch(prefix: String, d: String): String =
    sys.props.getOrElse("java.io.tmpdir", "/tmp") +
      "/" + prefix + "_" + d.replaceAll("[^A-Za-z0-9.]", "_")

  /** The sim_ivfadc_append oracle with the tombstoned ids excluded from
    * SERVING (not from training — deleted rows shaped the quantizers;
    * they just never reach the ADC shortlist): train coarse + residual
    * codebooks on the base slice, assign/encode the full corpus, probe
    * with `vec_id % 9 <> 5` filtered inside the scoring CTE. Exactly
    * what compacting served-minus-tombstones into one batch serves.
    */
  private lazy val adcLifecycleOracle: String =
    s"""WITH tr AS (
       |  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 4 <> 1),
       |${R8Queries.ivfAdcChainOn("tr", Some("vec_id % 4 <> 1"),
          servePred = Some("r.vec_id % 9 <> 5"))},
       |${R8Queries.rescoreTail}""".stripMargin

  /** Shared CTE chain restating [[Multimodal.dHash64]] over the
    * [[Multimodal.gradientFixture]] cell function: per-cell grays →
    * adjacent-cell comparison bits → the signed-64 signature assembled
    * from two ≤31-bit halves (BIGINT shifts never overflow; the hi
    * half's sign handling reproduces two's-complement exactly).
    */
  private val phashSigCtes: String =
    """cells AS (
      |  SELECT d.doc_id, cx.cx, cy.cy,
      |    32 + ((d.doc_id // 2) * 7 + cx.cx * 5 + cy.cy * 3 +
      |          (d.doc_id % 2) *
      |          (CASE WHEN cx.cx = 4 AND cy.cy = 3 THEN 9 ELSE 0 END)) % 64
      |      AS g
      |  FROM documents d,
      |       (SELECT unnest(generate_series(0, 8)) AS cx) cx,
      |       (SELECT unnest(generate_series(0, 7)) AS cy) cy),
      |bits AS (
      |  SELECT a.doc_id, CAST(a.cy * 8 + a.cx AS BIGINT) AS k
      |  FROM cells a JOIN cells b
      |    ON b.doc_id = a.doc_id AND b.cy = a.cy AND b.cx = a.cx + 1
      |  WHERE b.g > a.g),
      |halves AS (
      |  SELECT d.doc_id,
      |    CAST(coalesce(sum(CASE WHEN b.k < 32 THEN 1::BIGINT << b.k END),
      |                  0) AS BIGINT) AS lo,
      |    CAST(coalesce(sum(CASE WHEN b.k >= 32
      |                           THEN 1::BIGINT << (b.k - 32) END),
      |                  0) AS BIGINT) AS hi
      |  FROM documents d LEFT JOIN bits b USING (doc_id)
      |  GROUP BY d.doc_id),
      |sig AS (
      |  SELECT doc_id,
      |    CAST(CASE WHEN hi >= 2147483648
      |              THEN (hi - 4294967296) * 4294967296 + lo
      |              ELSE hi * 4294967296 + lo END AS BIGINT) AS phash
      |  FROM halves)""".stripMargin

  val all: Seq[Q] = Seq(

    Q("mm_phash",
      "Perceptual image hashing with a REAL codec: each doc_id becomes " +
        "a genuine 18x16 grayscale PNG of 2x2 constant cells (grays a " +
        "pure function of the id, consecutive id pairs near-identical " +
        "by construction), ImageIO decodes it, and dHash64 computes the " +
        "64-bit difference hash — integer luma, exact integer area " +
        "partition into a 9x8 grid, adjacent-cell mean comparisons via " +
        "cross-multiplied sums, no floating point anywhere. The fixture " +
        "makes each grid cell exactly one fixture cell, so DuckDB " +
        "restates the whole signature from the cell function without a " +
        "codec — the decode is real, the expectation is constructed.",
      (s, d) => Multimodal.perceptualHash(
          Multimodal.gradientFixture(
            Tables.documents(s, d).select(col("doc_id")), "doc_id"),
          "payload")
        .select(col("doc_id"), col("phash"))
        .orderBy("doc_id"),
      Some(s"""WITH $phashSigCtes
              |SELECT doc_id, phash FROM sig ORDER BY doc_id""".stripMargin)),

    Q("mm_neardup",
      "Image NEAR-DUPLICATE pairs — the multimodal analogue of MinHash " +
        "dedup: dHash64 signatures over the gradient fixture (planted: " +
        "each odd id differs from its even partner in ONE bumped cell, " +
        "<= 2 signature bits), paired by the SAME Hamming pigeonhole " +
        "blocking as dedup_simhash — 4 disjoint 16-bit chunks, " +
        "candidates from an equi-join on (chunk, value), never a cross " +
        "join, exact bit_count(xor) verify <= 3. The oracle computes " +
        "signatures from the cell function and brute-forces all pairs " +
        "— complete-recall blocking is the gated claim.",
      (s, d) => {
        val sig = Multimodal.perceptualHash(
            Multimodal.gradientFixture(
              Tables.documents(s, d).select(col("doc_id")), "doc_id"),
            "payload")
          .select(col("doc_id"), col("phash").as("simhash"))
        Dedup.simhashPairs(sig, "doc_id", maxHamming = 3, bits = 64)
          .select(col("id_a"), col("id_b"), col("hamming"))
          .orderBy("id_a", "id_b")
      },
      Some(s"""WITH $phashSigCtes
              |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
              |       CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT)
              |         AS hamming
              |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
              |WHERE bit_count(xor(a.phash, b.phash)) <= 3
              |ORDER BY id_a, id_b""".stripMargin)),

    Q("sim_ivfadc_lifecycle",
      "The COMPRESSED vector index lifecycle under one gate (the " +
        "sim_ivf_lifecycle chain on the IVFADC layout): build on " +
        "vec_id % 4 <> 1 with the persisted frozen quantizer pair, " +
        "append the held-out quarter encoded with those SAME persisted " +
        "quantizers, tombstone-delete vec_id % 9 = 5, COMPACT " +
        "served-minus-tombstones into one fresh batch — rows keep " +
        "their persisted coarse assignment AND pq codes; nothing is " +
        "re-encoded — via the shared atomic supersede marker, VACUUM " +
        "the superseded directories, then probe: code-only ADC scan " +
        "over the single surviving batch + exact rescore. Oracle: the " +
        "append chain (train on the slice, encode the union) with the " +
        "deleted ids excluded from serving — rebuild-over-survivors-" +
        "with-frozen-quantizers is the gated definition of ADC " +
        "compaction correctness.",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val rest = emb.filter(col("vec_id") % 4 === 1)
        val qv = Similarity.vectorOf(emb, "vec_id", "embedding", 0L)
        val path = scratch("graft_ivfadc_lc", d)
        Similarity.ivfAdcWriteLayout(R9Queries.baseSlice(s, d),
          "vec_id", "embedding", path,
          kCoarse = 4, coarseIters = 1, m = 4, k = 8, iters = 1,
          dims = 64, trainedCoarse = Some(R9Queries.baseCoarse(s, d)),
          trainedBooks = Some(R9Queries.baseBooks(s, d)))
        Similarity.ivfAdcAppendLayout(rest, "vec_id", "embedding", path,
          batchId = 1L)
        Similarity.ivfDeleteLayout(
          emb.filter(col("vec_id") % 9 === 5).select("vec_id"), "vec_id",
          path, batchId = 2L)
        Similarity.ivfCompactLayout(s, path, "vec_id", newBatchId = 3L)
        Similarity.ivfVacuumLayout(s, path)
        Similarity.ivfAdcProbeLayout(s, path, qv, k = 10, nprobe = 2,
          rescore = 50)
      },
      Some(adcLifecycleOracle))
  )
}
