package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.{Dedup, Multimodal, Similarity, UnigramLm}

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

  /** Trained OPQ permutation + the winner's codebooks, memoized per
    * dataset dir (training is a pure function of the corpus): the gate
    * reuses the candidate evaluation's own training instead of paying a
    * third, and repeated bench passes pay none.
    */
  private val opqCache = new java.util.concurrent.ConcurrentHashMap[
    String, (Seq[Int], Seq[Seq[Seq[Double]]])]()

  private def trainedOpq(s: org.apache.spark.sql.SparkSession,
                         d: String): (Seq[Int], Seq[Seq[Seq[Double]]]) =
    opqCache.computeIfAbsent(d, _ =>
      Similarity.opqTrainedPermutationWithBooks(Tables.embeddings(s, d),
        "vec_id", "embedding", m = 4, k = 8, iters = 1, dims = 64))

  /** One training, two consumers (ta_unigram / ta_unigram_encode): the
    * unigram vocabulary is memoized per dataset dir — training is a
    * pure function of the corpus (pinned tie-breaks, see
    * [[UnigramLm]]), so both observe the identical vocab.
    */
  private val unigramCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Seq[(String, Long)], Long)]()

  private def trainedUnigram(s: org.apache.spark.sql.SparkSession,
                             d: String): (Seq[(String, Long)], Long) =
    unigramCache.computeIfAbsent(d, _ =>
      UnigramLm.train(Tables.documents(s, d), "text"))

  /** The [[UnigramLm]] training loop UNROLLED as DuckDB CTEs (the
    * bpeCtes idiom): wf = the length-capped word table; sub/v0/t0 the
    * substring seed (top-60 + all chars); per EM iteration i, a
    * recursive CTE seg{i} enumerates EVERY segmentation of every word
    * over vocab v{i-1} with the score multiplied in path order —
    * bit-identical IEEE doubles to the Spark side's Viterbi, because
    * probability is one division of exact integers and products
    * associate identically — best{i} takes rank 1 by (score DESC,
    * pieces ASC), use{i} recounts, v{i} prunes to top-40 + chars.
    */
  private val unigramCtes: String =
    """wfall AS (
      |  SELECT word, CAST(count(*) AS BIGINT) AS freq
      |  FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS word
      |        FROM documents)
      |  WHERE word <> '' GROUP BY word),
      |wf AS (SELECT * FROM wfall WHERE length(word) <= 12),
      |sub AS (
      |  SELECT substring(word, st.st, ls.l) AS piece,
      |         CAST(sum(freq) AS BIGINT) AS cnt
      |  FROM wf,
      |       (SELECT unnest(generate_series(1, 4)) AS l) ls,
      |       (SELECT unnest(generate_series(1, 12)) AS st) st
      |  WHERE st.st + ls.l - 1 <= length(word)
      |  GROUP BY 1),
      |seedtop AS (
      |  SELECT piece, cnt FROM sub
      |  QUALIFY row_number() OVER (ORDER BY cnt DESC, piece) <= 60),
      |v0 AS (
      |  SELECT piece, cnt FROM seedtop
      |  UNION ALL
      |  SELECT piece, cnt FROM sub
      |  WHERE length(piece) = 1
      |    AND piece NOT IN (SELECT piece FROM seedtop)),
      |t0 AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM v0),
      |seg1 AS (
      |  SELECT word, freq, 0 AS pos, CAST(1.0 AS DOUBLE) AS score,
      |         '' AS pieces
      |  FROM wf
      |  UNION ALL
      |  SELECT s.word, s.freq, s.pos + length(v.piece),
      |         s.score * (v.cnt / t.total),
      |         CASE WHEN s.pieces = '' THEN v.piece
      |              ELSE s.pieces || ' ' || v.piece END
      |  FROM seg1 s, v0 v, t0 t
      |  WHERE v.piece = substring(s.word, s.pos + 1, length(v.piece))),
      |best1 AS (
      |  SELECT word, freq, pieces FROM seg1
      |  WHERE pos = length(word)
      |  QUALIFY row_number() OVER (PARTITION BY word
      |                             ORDER BY score DESC, pieces) = 1),
      |use1 AS (
      |  SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt FROM (
      |    SELECT unnest(string_split(pieces, ' ')) AS piece, freq
      |    FROM best1)
      |  GROUP BY 1),
      |top1 AS (
      |  SELECT piece, cnt FROM use1
      |  QUALIFY row_number() OVER (ORDER BY cnt DESC, piece) <= 40),
      |v1 AS (
      |  SELECT piece, cnt FROM top1
      |  UNION ALL
      |  SELECT v.piece, CAST(coalesce(u.cnt, 0) AS BIGINT) AS cnt
      |  FROM v0 v LEFT JOIN use1 u USING (piece)
      |  WHERE length(v.piece) = 1
      |    AND v.piece NOT IN (SELECT piece FROM top1)),
      |t1 AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM v1),
      |seg2 AS (
      |  SELECT word, freq, 0 AS pos, CAST(1.0 AS DOUBLE) AS score,
      |         '' AS pieces
      |  FROM wf
      |  UNION ALL
      |  SELECT s.word, s.freq, s.pos + length(v.piece),
      |         s.score * (v.cnt / t.total),
      |         CASE WHEN s.pieces = '' THEN v.piece
      |              ELSE s.pieces || ' ' || v.piece END
      |  FROM seg2 s, v1 v, t1 t
      |  WHERE v.piece = substring(s.word, s.pos + 1, length(v.piece))),
      |best2 AS (
      |  SELECT word, freq, pieces FROM seg2
      |  WHERE pos = length(word)
      |  QUALIFY row_number() OVER (PARTITION BY word
      |                             ORDER BY score DESC, pieces) = 1),
      |use2 AS (
      |  SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt FROM (
      |    SELECT unnest(string_split(pieces, ' ')) AS piece, freq
      |    FROM best2)
      |  GROUP BY 1),
      |top2 AS (
      |  SELECT piece, cnt FROM use2
      |  QUALIFY row_number() OVER (ORDER BY cnt DESC, piece) <= 40),
      |v2 AS (
      |  SELECT piece, cnt FROM top2
      |  UNION ALL
      |  SELECT v.piece, CAST(coalesce(u.cnt, 0) AS BIGINT) AS cnt
      |  FROM v1 v LEFT JOIN use2 u USING (piece)
      |  WHERE length(v.piece) = 1
      |    AND v.piece NOT IN (SELECT piece FROM top2)),
      |t2 AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM v2)""".stripMargin

  /** Per-candidate distortion chains for the OPQ oracle: for each of
    * the 4 subspaces of `srcRel`, the unrolled kmeans training
    * (prefix-isolated), the DECIMAL(38,9)-quantized codebook
    * ([[graft.ops.Similarity.pqTrain]]'s grid pin), the decimal-exact
    * squared distances against it, the per-vector min, and the
    * decimal-exact total `${prefix}dist` — the value
    * [[graft.ops.Similarity.pqDistortion]] computes, restated.
    */
  private def pqDistortionCtes(prefix: String, srcRel: String): String = {
    val M = 4; val SUB = 16
    val chains = (0 until M).map { s =>
      s"""${prefix}sub$s AS MATERIALIZED (
         |  SELECT vec_id, embedding[${s * SUB + 1}:${(s + 1) * SUB}] AS embedding
         |  FROM $srcRel),
         |${R5Queries.kmeansCtesOn(s"${prefix}sub$s", k = 8,
            prefix = s"${prefix}p${s}_", iters = 1,
            assignRel = s"${prefix}sub$s", dims = SUB)},
         |${prefix}cq$s AS (
         |  SELECT cluster, i, cast(cast(c AS DECIMAL(38,9)) AS DOUBLE) AS c
         |  FROM ${prefix}p${s}_c1),
         |${prefix}dq$s AS (
         |  SELECT e.vec_id,
         |    cast(sum(cast((e.embedding[c.i]::DOUBLE - c.c)
         |                  * (e.embedding[c.i]::DOUBLE - c.c)
         |         AS DECIMAL(38,14))) AS DOUBLE) AS d,
         |    c.cluster
         |  FROM ${prefix}sub$s e, ${prefix}cq$s c
         |  GROUP BY e.vec_id, c.cluster),
         |${prefix}md$s AS (
         |  SELECT vec_id, min(d) AS d FROM ${prefix}dq$s GROUP BY vec_id)""".stripMargin
    }.mkString("," + System.lineSeparator())
    s"""$chains,
       |${prefix}dist AS MATERIALIZED (
       |  SELECT sum(cast(d AS DECIMAL(38,14))) AS dist FROM (
       |    SELECT d FROM ${prefix}md0 UNION ALL SELECT d FROM ${prefix}md1
       |    UNION ALL SELECT d FROM ${prefix}md2
       |    UNION ALL SELECT d FROM ${prefix}md3))""".stripMargin
  }

  val all: Seq[Q] = Seq(

    Q("ta_unigram",
      "Unigram-LM (SentencePiece-style) tokenizer TRAINING — the other " +
        "half of the tokenizer surface next to ta_bpe: ONE distributed " +
        "corpus pass builds the word-frequency table, then substring " +
        "seeding (top-60 + all chars) and 2 rounds of hard-EM (Viterbi " +
        "E-step under cnt/total probabilities, usage-recount M-step, " +
        "prune to top-40 + chars) run driver-local on the vocab-bounded " +
        "table — zero extra Spark jobs at any corpus size. Oracle: the " +
        "full EM unrolled as CTEs, Viterbi restated as ALL-path " +
        "enumeration ranked by (score DESC, pieces ASC) — bit-identical " +
        "IEEE doubles because probabilities are one exact-integer " +
        "division and products associate in path order in both engines.",
      (s, d) => {
        val (vocab, total) = trainedUnigram(s, d)
        import s.implicits._
        vocab.toDF("piece", "n")
          .withColumn("score",
            col("n").cast("double") / lit(total.toDouble))
          .orderBy(desc("n"), col("piece"))
      },
      Some(s"""WITH RECURSIVE $unigramCtes
              |SELECT piece, cnt AS n,
              |       CAST(cnt AS DOUBLE) / (SELECT total FROM t2) AS score
              |FROM v2 ORDER BY n DESC, piece""".stripMargin)),

    Q("ta_unigram_encode",
      "Tokenize the corpus with the trained unigram vocabulary: " +
        "posexploded words through the codegen'd UnigramSegment Viterbi " +
        "expression — a shuffle-free projection, the table shipped once " +
        "per executor JVM via the codegen reference mechanism (the " +
        "loaded-tokenizer shape of ta_bpe_encode with max-product " +
        "instead of merge-replay semantics). Oracle: the same trained " +
        "vocab's all-path enumeration joined back onto the corpus words.",
      (s, d) => {
        val (vocab, total) = trainedUnigram(s, d)
        UnigramLm.encode(Tables.documents(s, d), "doc_id", "text",
          vocab, total)
          .orderBy("doc_id", "word_pos")
      },
      Some(s"""WITH RECURSIVE $unigramCtes,
              |tok AS (
              |  SELECT doc_id, j - 1 AS word_pos, ws[j] AS word FROM (
              |    SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS j
              |    FROM (SELECT doc_id,
              |            list_filter(string_split_regex(trim(text), '\\s+'),
              |                        x -> x <> '') AS ws
              |          FROM documents))),
              |wenc AS (SELECT DISTINCT word FROM tok),
              |sege AS (
              |  SELECT word, 0 AS pos, CAST(1.0 AS DOUBLE) AS score,
              |         '' AS pieces
              |  FROM wenc
              |  UNION ALL
              |  SELECT s.word, s.pos + length(v.piece),
              |         s.score * (v.cnt / t.total),
              |         CASE WHEN s.pieces = '' THEN v.piece
              |              ELSE s.pieces || ' ' || v.piece END
              |  FROM sege s, v2 v, t2 t
              |  WHERE v.piece = substring(s.word, s.pos + 1, length(v.piece))),
              |beste AS (
              |  SELECT word, pieces FROM sege
              |  WHERE pos = length(word)
              |  QUALIFY row_number() OVER (PARTITION BY word
              |                             ORDER BY score DESC, pieces) = 1)
              |SELECT t.doc_id, t.word_pos, b.pieces
              |FROM tok t LEFT JOIN beste b USING (word)
              |ORDER BY doc_id, word_pos""".stripMargin)),

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

    Q("stream_dedup_index",
      "Structured Streaming maintains the at-rest MinHash band index: " +
        "document file stream -> foreachBatch -> appendToBandIndex with " +
        "the micro-batch id as the index batch id — the exactly-once " +
        "maintenance pattern (streaming replay + same-id idempotent " +
        "append) on the FOURTH index family. Each micro-batch shingles " +
        "only itself; the band-df guard is recomputed at serve time " +
        "over the served union, so candidates from the streamed index " +
        "== a batch banding run over the same corpus and the " +
        "dedup_minhash oracle applies verbatim.",
      (s, d) => {
        val path = graft.streaming.EventStream.runBandIndexIngestStream(
          s, d, scratch("graft_stream_bidx", d))
        Dedup.bandIndexCandidates(s, path, "doc_id")
          .orderBy("id_a", "id_b")
      },
      Some(
        s"""WITH ${ExtQueries.minhashPairCtes}
           |SELECT id_a, id_b, count(*) AS bands_matched
           |FROM pairs
           |GROUP BY 1, 2
           |ORDER BY id_a, id_b""".stripMargin)),

    Q("sim_recall_opq",
      "Recall@10 gate for OPQ-style PQ — the trained orthogonal " +
        "transform restricted to dimension PERMUTATIONS (Ge et al. " +
        "CVPR'13; permutations are OPQ's own initialization family), " +
        "selected by OPQ's REAL objective: train PQ codebooks for each " +
        "candidate (identity; variance-balanced snake from the " +
        "division-free decimal-exact key n*Sx2 - Sx*Sx), measure exact " +
        "quantization distortion, keep the argmin (ties to identity), " +
        "then run the IDENTICAL PQ chain (4x16, 8 codes, ADC shortlist " +
        "50, exact rescore) at the SAME code budget as sim_recall_pq. " +
        "Orthogonality keeps the exact ground truth invariant. On the " +
        "near-isotropic fixture the trainer correctly selects identity " +
        "(every rotation is a no-op by symmetry — distortion says so: " +
        "422.60 vs 423.24), so recall == sim_recall_pq by construction " +
        "rather than seeding luck; SimilaritySpec constructs the " +
        "anisotropic case where the same trainer picks the balanced " +
        "permutation and measurably lifts recall. The oracle re-derives " +
        "BOTH candidates' codebooks and distortions and replays the " +
        "argmin choice.",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val (perm, books) = trainedOpq(s, d)
        val pemb = Similarity.permuteVectors(emb, "embedding", perm)
        val qv = Similarity.vectorOf(pemb, "vec_id", "embedding", 0L)
        val exact = Similarity.bruteForceTopK(pemb, "vec_id", "embedding",
          qv, 10)
        val approx = Similarity.pqTopK(pemb, "vec_id", "embedding", qv,
          m = 4, k = 8, iters = 1, dims = 64, rescore = 50, topK = 10,
          trainedBooks = Some(books))
        Similarity.recallAtK(exact, approx, "vec_id", 10)
      },
      Some {
        val dotSql = (a: String, b: String) =>
          s"cast(sum(cast($a[i]::DOUBLE * $b[i]::DOUBLE AS DECIMAL(38,14))) AS DOUBLE)"
        s"""WITH vstats AS (
           |  SELECT g.i,
           |    CAST(count(*) AS DOUBLE) *
           |      CAST(sum(cast(e.embedding[g.i]::DOUBLE * e.embedding[g.i]::DOUBLE
           |               AS DECIMAL(38,14))) AS DOUBLE)
           |    - CAST(sum(cast(e.embedding[g.i]::DOUBLE AS DECIMAL(38,14))) AS DOUBLE)
           |      * CAST(sum(cast(e.embedding[g.i]::DOUBLE AS DECIMAL(38,14))) AS DOUBLE)
           |      AS vkey
           |  FROM main.embeddings e, generate_series(1, 64) g(i)
           |  GROUP BY g.i),
           |rankedv AS (
           |  SELECT i AS orig_dim, row_number() OVER (ORDER BY vkey DESC, i) - 1 AS t
           |  FROM vstats),
           |assignv AS (
           |  SELECT orig_dim, t,
           |    CASE WHEN (t // 4) % 2 = 0 THEN t % 4 ELSE 3 - (t % 4) END AS sub
           |  FROM rankedv),
           |permv AS (
           |  SELECT orig_dim,
           |    sub * 16 + row_number() OVER (PARTITION BY sub ORDER BY t) - 1
           |      AS new_pos
           |  FROM assignv),
           |pembc AS MATERIALIZED (
           |  SELECT e.vec_id,
           |    list(CAST(e.embedding[p.orig_dim] AS FLOAT) ORDER BY p.new_pos)
           |      AS embedding
           |  FROM main.embeddings e, permv p
           |  GROUP BY e.vec_id),
           |${pqDistortionCtes("ia", "main.embeddings")},
           |${pqDistortionCtes("sn", "pembc")},
           |embeddings AS MATERIALIZED (
           |  SELECT e.vec_id,
           |    CASE WHEN (SELECT dist FROM iadist) <= (SELECT dist FROM sndist)
           |         THEN e.embedding ELSE pe.embedding END AS embedding
           |  FROM main.embeddings e JOIN pembc pe USING (vec_id)),
           |${R8Queries.pqCtes()},
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

    Q("dedup_index",
      "The MinHash band table AT REST — incremental dedup against 100 " +
        "TB of history with EXACT candidate recovery (the at-rest " +
        "complement of dedup_incremental's Bloom filter, which answers " +
        "'definitely new' but never 'near-dup of WHOM'): build the " +
        "(id, band, h) table on doc_id % 4 <> 1, append the held-out " +
        "quarter shingling ONLY that batch, tombstone-delete doc_id % " +
        "17 = 3, compact served-minus-tombstones (signatures preserved, " +
        "nothing re-shingled), vacuum, then serve candidates with the " +
        "band-frequency guard recomputed over the served set. Oracle: " +
        "the dedup_minhash banding CTEs over the surviving corpus — " +
        "batch-incremental candidates == full-rebuild candidates is " +
        "the gated definition. Serving reads the compact band table, " +
        "never the historical corpus text.",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val path = scratch("graft_dedup_idx", d)
        Dedup.writeBandIndex(docs.filter(col("doc_id") % 4 =!= 1),
          "doc_id", "text", path)
        Dedup.appendToBandIndex(docs.filter(col("doc_id") % 4 === 1),
          "doc_id", "text", path, batchId = 1L)
        Dedup.deleteFromBandIndex(
          docs.filter(col("doc_id") % 17 === 3).select("doc_id"),
          "doc_id", path, batchId = 2L)
        Dedup.compactBandIndex(s, path, "doc_id", newBatchId = 3L)
        Dedup.vacuumBandIndex(s, path)
        Dedup.bandIndexCandidates(s, path, "doc_id")
          .orderBy("id_a", "id_b")
      },
      Some(
        s"""WITH documents AS (
           |  SELECT * FROM main.documents WHERE doc_id % 17 <> 3),
           |${ExtQueries.minhashPairCtes}
           |SELECT id_a, id_b, count(*) AS bands_matched
           |FROM pairs
           |GROUP BY 1, 2
           |ORDER BY id_a, id_b""".stripMargin)),

    Q("stream_late",
      "LATE DATA under a real event-time watermark: the events table " +
        "replays as on-time body (below an hour-aligned cutoff, minus " +
        "the event_id % 13 = 4 'arrives late' subset), then a second " +
        "batch of the tail PLUS the late subset, then a far-future " +
        "flush. The 1-hour watermark freezes after batch 1, so late " +
        "rows whose window closed at or before it are DROPPED while " +
        "late rows inside it still count — append mode then emits " +
        "every closed window once. Oracle: recompute the watermark " +
        "from the same batch-1 membership predicate " +
        "(millisecond-truncated, as Spark's EventTimeStats tracks it) " +
        "and aggregate events minus the dropped set — kept-vs-dropped " +
        "is hash-checked, not assumed.",
      (s, d) => graft.streaming.EventStream.runLateStream(s, d)
        .orderBy("hour_start", "event_type"),
      Some("""WITH bounds AS (
             |  SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi
             |  FROM events),
             |cut AS (
             |  SELECT ((lo + ((hi - lo) * 4) // 5) // 3600000000)
             |           * 3600000000 AS c_us
             |  FROM bounds),
             |wm AS (
             |  SELECT (max(epoch_us(ts)) // 1000 - 3600000) * 1000 AS wm_us
             |  FROM events, cut
             |  WHERE epoch_us(ts) < c_us AND NOT (event_id % 13 = 4)),
             |kept AS (
             |  SELECT e.* FROM events e, cut, wm
             |  WHERE NOT (e.event_id % 13 = 4
             |             AND epoch_us(e.ts) < c_us
             |             AND (epoch_us(e.ts) // 3600000000 + 1)
             |                   * 3600000000 <= wm.wm_us))
             |SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
             |         AS hour_start,
             |  event_type, count(*) AS n,
             |  cast(sum(cast(value AS DECIMAL(28,8))) AS DOUBLE) AS sum_value
             |FROM kept
             |GROUP BY 1, 2
             |ORDER BY hour_start, event_type""".stripMargin)),

    Q("mm_audio_meta",
      "Multimodal AUDIO with a REAL codec: each doc_id becomes a " +
        "genuine RIFF/WAV container (AudioSystem-encoded PCM16 mono, " +
        "8 kHz, sample values and counts pure integer functions of the " +
        "id), javax.sound.sampled parses the header and streams the " +
        "frames, and audioMeta reports integer-EXACT signal stats: " +
        "n_samples, sum, sum of squares and zero crossings — the " +
        "content fingerprint a SQL oracle can predict for constructed " +
        "signals (an md5 of raw PCM bytes could not be restated " +
        "portably). The codec work is real, the expectations are " +
        "constructed — the mm_meta contract, audio edition.",
      (s, d) => Multimodal.audioMeta(
          Multimodal.wavFixture(
            Tables.documents(s, d).select(col("doc_id")), "doc_id"),
          "payload")
        .select(col("doc_id"), col("audio.sample_rate"),
          col("audio.n_samples"), col("audio.sum_samples"),
          col("audio.sum_squares"), col("audio.zero_crossings"))
        .orderBy("doc_id"),
      Some("""WITH s AS (
             |  SELECT d.doc_id, g.i,
             |    ((d.doc_id // 2) * 31 + g.i * 17) % 2001 - 1000
             |      + (d.doc_id % 2) *
             |        (CASE WHEN g.i // 8 = 7 THEN 25 ELSE 0 END) AS v
             |  FROM documents d, generate_series(0, 599) g(i)
             |  WHERE g.i < 400 + ((d.doc_id // 2) % 5) * 40)
             |SELECT doc_id,
             |  CAST(8000 AS BIGINT) AS sample_rate,
             |  count(*) AS n_samples,
             |  CAST(sum(v) AS BIGINT) AS sum_samples,
             |  CAST(sum(v * v) AS BIGINT) AS sum_squares,
             |  CAST(coalesce(sum(CASE WHEN prev IS NOT NULL
             |             AND ((prev >= 0) <> (v >= 0)) THEN 1 END), 0)
             |       AS BIGINT) AS zero_crossings
             |FROM (SELECT doc_id, i, v,
             |        lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS prev
             |      FROM s)
             |GROUP BY doc_id
             |ORDER BY doc_id""".stripMargin)),

    Q("mm_audio_energy",
      "Frame-level audio energy — the feature-extraction shape every " +
        "VAD/quality gate starts from: decode the WAV fixture, split " +
        "into 160-sample frames (20 ms at 8 kHz, last frame ragged), " +
        "emit each frame's exact sum-of-squares. Decode runs batched " +
        "per partition; the oracle restates frames as i // 160 groups " +
        "over the sample function.",
      (s, d) => Multimodal.audioFrameEnergy(
          Multimodal.wavFixture(
            Tables.documents(s, d).select(col("doc_id")), "doc_id"),
          "doc_id", "payload")
        .orderBy("doc_id", "frame_no"),
      Some("""WITH s AS (
             |  SELECT d.doc_id, g.i,
             |    ((d.doc_id // 2) * 31 + g.i * 17) % 2001 - 1000
             |      + (d.doc_id % 2) *
             |        (CASE WHEN g.i // 8 = 7 THEN 25 ELSE 0 END) AS v
             |  FROM documents d, generate_series(0, 599) g(i)
             |  WHERE g.i < 400 + ((d.doc_id // 2) % 5) * 40)
             |SELECT doc_id, i // 160 AS frame_no,
             |  count(*) AS n_in_frame,
             |  CAST(sum(v * v) AS BIGINT) AS energy
             |FROM s
             |GROUP BY doc_id, frame_no
             |ORDER BY doc_id, frame_no""".stripMargin)),

    Q("mm_audio_resample",
      "Real audio RESAMPLE roundtrip (the mm_resize contract, audio " +
        "edition): decode the 8 kHz WAV fixture, linear-interpolate to " +
        "6 kHz with EXACT integer rational arithmetic (out(i) = " +
        "(s(lo)*(dst-r) + s(lo+1)*r) / dst truncated toward zero, lo = " +
        "i*src div dst, last sample clamped), re-encode as a genuine " +
        "WAV, decode AGAIN and report the integer-exact stats of the " +
        "re-decoded signal — the roundtrip proves the codec. Oracle " +
        "restates every interpolated sample from the fixture function.",
      (s, d) => Multimodal.audioResample(
          Multimodal.wavFixture(
            Tables.documents(s, d).select(col("doc_id")), "doc_id"),
          "payload", dstRate = 6000)
        .select(col("doc_id"), col("resampled_meta.sample_rate"),
          col("resampled_meta.n_samples"),
          col("resampled_meta.sum_samples"),
          col("resampled_meta.sum_squares"),
          col("resampled_meta.zero_crossings"))
        .orderBy("doc_id"),
      Some("""WITH s AS (
             |  SELECT d.doc_id, g.i,
             |    ((d.doc_id // 2) * 31 + g.i * 17) % 2001 - 1000
             |      + (d.doc_id % 2) *
             |        (CASE WHEN g.i // 8 = 7 THEN 25 ELSE 0 END) AS v
             |  FROM documents d, generate_series(0, 599) g(i)
             |  WHERE g.i < 400 + ((d.doc_id // 2) % 5) * 40),
             |n AS (SELECT doc_id, count(*) AS n FROM s GROUP BY doc_id),
             |oidx AS (
             |  SELECT n.doc_id, n.n,
             |    unnest(generate_series(0,
             |      CAST((n.n * 6000 + 7999) // 8000 AS INT) - 1)) AS i
             |  FROM n),
             |o AS (
             |  SELECT x.doc_id, x.i,
             |    (sa.v * (6000 - (x.i * 8000) % 6000)
             |     + sb.v * ((x.i * 8000) % 6000)) // 6000 AS v
             |  FROM oidx x
             |  JOIN s sa ON sa.doc_id = x.doc_id
             |    AND sa.i = least((x.i * 8000) // 6000, x.n - 1)
             |  JOIN s sb ON sb.doc_id = x.doc_id
             |    AND sb.i = least((x.i * 8000) // 6000 + 1, x.n - 1))
             |SELECT doc_id,
             |  CAST(6000 AS BIGINT) AS sample_rate,
             |  count(*) AS n_samples,
             |  CAST(sum(v) AS BIGINT) AS sum_samples,
             |  CAST(sum(v * v) AS BIGINT) AS sum_squares,
             |  CAST(coalesce(sum(CASE WHEN prev IS NOT NULL
             |             AND ((prev >= 0) <> (v >= 0)) THEN 1 END), 0)
             |       AS BIGINT) AS zero_crossings
             |FROM (SELECT doc_id, i, v,
             |        lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS prev
             |      FROM o)
             |GROUP BY doc_id
             |ORDER BY doc_id""".stripMargin)),

    Q("mm_audio_neardup",
      "Audio NEAR-DUPLICATE pairs — near-dup completed across all three " +
        "modalities (text SimHash, image dHash, now audio): the 64-bit " +
        "energy-delta hash (bit f set iff the exact 8-sample frame " +
        "energy rises from frame f to f+1 — lossless under PCM " +
        "re-encode, invariant to uniform gain, local edits flip only " +
        "their frames' bits) over the WAV fixture, whose consecutive " +
        "id pairs share the signal up to one bumped frame (<= 2 bits), " +
        "paired by the SAME 64-bit Hamming pigeonhole equi-join as " +
        "mm_neardup. Oracle: frame energies, delta bits and the " +
        "two-halves signed signature restated from the sample " +
        "function, brute-force pair join.",
      (s, d) => {
        val sig = Multimodal.audioDHash(
            Multimodal.wavFixture(
              Tables.documents(s, d).select(col("doc_id")), "doc_id"),
            "payload")
          .select(col("doc_id"), col("ahash").as("simhash"))
        Dedup.simhashPairs(sig, "doc_id", maxHamming = 3, bits = 64)
          .select(col("id_a"), col("id_b"), col("hamming"))
          .orderBy("id_a", "id_b")
      },
      Some("""WITH s AS (
             |  SELECT d.doc_id, g.i,
             |    ((d.doc_id // 2) * 31 + g.i * 17) % 2001 - 1000
             |      + (d.doc_id % 2) *
             |        (CASE WHEN g.i // 8 = 7 THEN 25 ELSE 0 END) AS v
             |  FROM documents d, generate_series(0, 599) g(i)
             |  WHERE g.i < 400 + ((d.doc_id // 2) % 5) * 40),
             |e AS (
             |  SELECT doc_id, i // 8 AS f, CAST(sum(v * v) AS BIGINT) AS en
             |  FROM s GROUP BY 1, 2),
             |bits AS (
             |  SELECT a.doc_id, CAST(a.f AS BIGINT) AS k
             |  FROM e a JOIN e b ON b.doc_id = a.doc_id AND b.f = a.f + 1
             |  WHERE b.en > a.en AND a.f < 64),
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
             |              ELSE hi * 4294967296 + lo END AS BIGINT) AS ahash
             |  FROM halves)
             |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |       CAST(bit_count(xor(a.ahash, b.ahash)) AS BIGINT)
             |         AS hamming
             |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
             |WHERE bit_count(xor(a.ahash, b.ahash)) <= 3
             |ORDER BY id_a, id_b""".stripMargin)),

    Q("mm_pipeline",
      "The MULTIMODAL CURATION FLAGSHIP — the ops composing end-to-end " +
        "the way an image-corpus curation run chains them: real PNG " +
        "decode -> integer-exact brightness gate (sum of fixed-point " +
        "lumas >= threshold — the exposure/quality filter) -> dHash64 " +
        "signatures -> Hamming pigeonhole near-dup pairs among the " +
        "SURVIVING images only -> connected components -> min-id " +
        "survivor per cluster (singletons are their own cluster). One " +
        "lazy plan up to the CC driver loop; the gate and the hash ride " +
        "the same decode pass. The pair stage runs simhashPairs in " +
        "CAPPED mode (maxChunkDf = 256): the round-12 100x probe " +
        "measured the exact-mode pigeonhole going quadratic when " +
        "signature density grows (2.4 GB shuffle at 10x, on track for " +
        "~240 GB at 100x). The cap degrades an oversized chunk group " +
        "to an id-ordered chain — O(group) pairs instead of " +
        "O(group^2). Approximation honesty: for a group of IDENTICAL " +
        "signatures (the mass-duplicate case the cap targets) " +
        "components are unchanged; for a group of merely-similar " +
        "signatures the chain may MERGE clusters exact mode keeps " +
        "apart (chain pairs keep their true hamming and are not " +
        "re-filtered — dropping them would disconnect the group), so " +
        "capped mode over-merges, never splits: acceptable for a " +
        "dedup CLUSTERING consumer (conservative — at worst it " +
        "removes extra near-dups), wrong for pair-level verify " +
        "consumers, which must use exact mode. At fixture scale no " +
        "group reaches the cap, so capped == exact and the oracle " +
        "stays bit-identical. " +
        "Oracle: the whole chain restated — cell lumas, gate, " +
        "signatures, brute-force pairs, recursive-CTE reachability.",
      (s, d) => {
        val imgs = Multimodal.perceptualHash(
          Multimodal.imageLumaStats(
            Multimodal.gradientFixture(
              Tables.documents(s, d).select(col("doc_id")), "doc_id"),
            "payload"),
          "payload")
        val gated = graft.core.Caches.track(
          imgs.filter(col("sum_luma") >= 18144000L)
            .select(col("doc_id"), col("phash").as("simhash")))
        val pairs = Dedup.simhashPairs(gated, "doc_id", maxHamming = 3,
          bits = 64, maxChunkDf = 256)
        val cc = Dedup.connectedComponents(pairs, "id_a", "id_b")
        val w = org.apache.spark.sql.expressions.Window.partitionBy("cluster")
        gated.select(col("doc_id"))
          .join(cc.select(col("id").as("doc_id"),
            col("label").as("cluster")), Seq("doc_id"), "left")
          .withColumn("cluster", coalesce(col("cluster"), col("doc_id")))
          .withColumn("cluster_size", count(lit(1)).over(w))
          .withColumn("is_survivor", col("doc_id") === col("cluster"))
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE $phashSigCtes,
              |lum AS (
              |  SELECT doc_id, CAST(sum(4000 * g) AS BIGINT) AS sum_luma
              |  FROM cells GROUP BY doc_id),
              |gated AS (
              |  SELECT doc_id FROM lum WHERE sum_luma >= 18144000),
              |gsig AS (
              |  SELECT s.doc_id, s.phash FROM sig s JOIN gated USING (doc_id)),
              |gpairs AS (
              |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
              |  FROM gsig a JOIN gsig b ON a.doc_id < b.doc_id
              |  WHERE bit_count(xor(a.phash, b.phash)) <= 3),
              |edges AS (
              |  SELECT id_a AS src, id_b AS dst FROM gpairs
              |  UNION SELECT id_b, id_a FROM gpairs),
              |reach AS (
              |  SELECT src AS id, src AS lab FROM edges
              |  UNION
              |  SELECT e.dst AS id, r.lab FROM reach r
              |  JOIN edges e ON e.src = r.id),
              |cc AS (SELECT id, min(lab) AS cluster FROM reach GROUP BY id),
              |fullset AS (
              |  SELECT g.doc_id, coalesce(cc.cluster, g.doc_id) AS cluster
              |  FROM gated g LEFT JOIN cc ON cc.id = g.doc_id)
              |SELECT doc_id, cluster,
              |       count(*) OVER (PARTITION BY cluster) AS cluster_size,
              |       doc_id = cluster AS is_survivor
              |FROM fullset ORDER BY doc_id""".stripMargin)),

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
