package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import graft.core.Tables
import graft.ops.{Dedup, Multimodal, Similarity, TextAnalysis, TextOps}
import graft.streaming.EventStream

/** North-star extension queries (BASELINE.json): dedup, similarity search,
  * text analysis, JSON events, multimodal plumbing, streaming parity.
  * Oracle determinism rests on two pillars: md5 (identical hex in both
  * engines) and decimal-exact summation (order-independent); see
  * [[OracleCompat]].
  */
object ExtQueries {

  /** DuckDB restatement of Dedup.charShingles. */
  private def shingleSql(c: String, k: Int): String =
    s"list_distinct(list_transform(generate_series(1, greatest(length($c)-${k - 1},1)), i -> substr($c, i, $k)))"

  /** DuckDB restatement of Dedup.wordShingles (shared with R2Queries). */
  private[queries] def wordShingleSqlPub(c: String, n: Int): String =
    wordShingleSql(c, n)

  /** DuckDB restatement of Dedup.wordShingles. */
  private def wordShingleSql(c: String, n: Int): String = {
    val w = s"string_split_regex(trim($c), '\\s+')"
    s"list_distinct(list_transform(generate_series(1, greatest(len($w)-${n - 1},1)), " +
      s"i -> array_to_string(list_slice($w, i, i+${n - 1}), ' ')))"
  }

  private[queries] val cleanSql =
    """trim(regexp_replace(regexp_replace(lower(text), '[\x00-\x1f]+', ' ', 'g'), '\s+', ' ', 'g'))"""

  /** DuckDB restatement of Dedup.dotExact over index i (1-based). */
  private def dotSql(a: String, b: String): String =
    s"cast(sum(cast($a[i]::DOUBLE * $b[i]::DOUBLE AS DECIMAL(38,14))) AS DOUBLE)"

  /** DuckDB CTE list mirroring Dedup.minhashCandidates' signature + band
    * stages (2 bands × 3 rows over word 5-gram shingles) — shared by the
    * dedup_minhash oracle and R2Queries' dedup_cluster oracle.
    */
  private[queries] def minhashBandCtes: String = {
    def slice(i: Int) = s"substr(md5(s), ${i * 5 + 1}, 5)"
    val mhs = (0 until 6).map(i =>
      s"list_min(list_transform(${wordShingleSql("text", 5)}, s -> ${slice(i)})) AS mh$i")
      .mkString(",\n    ")
    val bands = (0 until 2).map(b =>
      s"SELECT doc_id, $b AS band, mh${3 * b} || mh${3 * b + 1} || mh${3 * b + 2} AS h FROM sig")
      .mkString("\n  UNION ALL ")
    s"""sig AS (
       |  SELECT doc_id,
       |    $mhs
       |  FROM documents),
       |bands AS (
       |  $bands)""".stripMargin
  }

  /** [[minhashBandCtes]] plus the band-frequency-capped pair stage,
    * mirroring Dedup.minhashCandidates' maxBandDf guard: band groups of
    * ≤`cap` docs emit all pairs, larger groups emit the id-ordered chain.
    * Produces `pairs(id_a, id_b, band)` — one row per (band, pair).
    * The default cap 256 is the production guard (dedup_minhash);
    * [[R34Queries]] re-uses the same CTE at cap 1 so the chain path
    * BINDS under an oracle at fixture scale.
    */
  private[queries] def minhashPairCtes: String = minhashPairCtes(256)

  private[queries] def minhashPairCtes(cap: Int): String =
    s"""$minhashBandCtes,
       |bf AS (
       |  SELECT doc_id, band, h, count(*) OVER (PARTITION BY band, h) AS df_b
       |  FROM bands),
       |pairs AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.band
       |  FROM bf a JOIN bf b
       |    ON a.band = b.band AND a.h = b.h AND a.doc_id < b.doc_id
       |  WHERE a.df_b <= $cap AND b.df_b <= $cap
       |  UNION ALL
       |  SELECT id_a, id_b, band FROM (
       |    SELECT doc_id AS id_a,
       |           lead(doc_id) OVER (PARTITION BY band, h ORDER BY doc_id) AS id_b,
       |           band
       |    FROM bf WHERE df_b > $cap)
       |  WHERE id_b IS NOT NULL)""".stripMargin

  /** DuckDB restatement of [[Dedup.simhash16]]: word-level md5 nibbles →
    * 16 sign-of-bit-sum bits, ending in `shsig(doc_id, simhash)`. Shared
    * by `dedup_simhash` and the capped-pigeonhole gate in [[R33Queries]].
    */
  private[queries] def simhash16Ctes: String = {
    val sums = (0 until 16).map { b =>
      val hexPos = b / 4 + 1
      val div = 1 << (b % 4)
      s"sum((((instr('0123456789abcdef', substr(h4, $hexPos, 1)) - 1) // $div) % 2) * 2 - 1) AS s$b"
    }.mkString(",\n    ")
    val hash = (0 until 16).map(b => s"(CASE WHEN s$b > 0 THEN ${1L << b} ELSE 0 END)")
      .mkString(" + ")
    s"""shw0 AS (
       |  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS w FROM documents),
       |shw AS (SELECT doc_id, substr(md5(w), 1, 4) AS h4 FROM shw0),
       |shbits AS (
       |  SELECT doc_id,
       |    $sums
       |  FROM shw GROUP BY doc_id),
       |shsig AS (SELECT doc_id, CAST($hash AS BIGINT) AS simhash FROM shbits)""".stripMargin
  }

  val all: Seq[Q] = Seq(

    Q("dedup_exact",
      "Exact dedup groups by normalized key (here: 40-char prefix — the " +
        "fixtures plant prefix duplicates): one shuffle on the key, " +
        "min-id survivor.",
      (s, d) => Dedup.exactDupGroups(Tables.documents(s, d),
          col("doc_id"), substring(col("text"), 1, 40))
        .orderBy("dup_key"),
      Some("""SELECT substr(text, 1, 40) AS dup_key, min(doc_id) AS keep_id,
             |       count(*) AS group_size
             |FROM documents
             |GROUP BY 1 HAVING count(*) > 1
             |ORDER BY dup_key""".stripMargin)),

    Q("dedup_minhash",
      "MinHash-LSH near-dup candidates over word 5-gram shingles with " +
        "2 bands × 3 rows banding (P(candidate)=1-(1-J³)² — the S-curve " +
        "that rejects the merely-similar): per-shingle md5 once, " +
        "partial-agg signatures, band-key self-join; only (id, band, key) " +
        "ever shuffles. Band groups over maxBandDf=256 docs (degenerate " +
        "mass-duplicate keys) degrade to the id-ordered chain — O(n) " +
        "pairs, same connected components — and the oracle mirrors the " +
        "cap, so the guard path itself is hash-checked.",
      (s, d) => Dedup.minhashCandidates(Tables.documents(s, d), "doc_id", "text",
          Dedup.Shingler.words(5), bandsN = 2, rowsPerBand = 3)
        .orderBy("id_a", "id_b"),
      Some(
        s"""WITH $minhashPairCtes
           |SELECT id_a, id_b, count(*) AS bands_matched
           |FROM pairs
           |GROUP BY 1, 2
           |ORDER BY id_a, id_b""".stripMargin)),

    Q("dedup_jaccard",
      "Word 3-gram Jaccard near-dup pairs with a shingle document-" +
        "frequency cap (boilerplate guard bounding the self-join " +
        "quadratically; deterministic md5 mod-p sampling available for " +
        "larger shingle universes).",
      (s, d) => Dedup.jaccardPairs(Tables.documents(s, d), "doc_id", "text",
          Dedup.Shingler.words(3), threshold = 0.5, maxShingleDf = 64)
        .orderBy("id_a", "id_b"),
      Some(s"""WITH sh AS (
              |  SELECT doc_id AS id, unnest(${wordShingleSql("text", 3)}) AS sh FROM documents),
              |rare AS (SELECT sh FROM sh GROUP BY sh HAVING count(*) <= 64),
              |f AS (SELECT sh.id, sh.sh FROM sh JOIN rare USING (sh)),
              |counts AS (SELECT id, count(*) AS n_sh FROM f GROUP BY id),
              |common AS (
              |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_common
              |  FROM f a JOIN f b ON a.sh = b.sh AND a.id < b.id
              |  GROUP BY 1, 2)
              |SELECT id_a, id_b, n_common,
              |       n_common::DOUBLE / (ca.n_sh + cb.n_sh - n_common) AS jaccard
              |FROM common
              |JOIN counts ca ON ca.id = id_a
              |JOIN counts cb ON cb.id = id_b
              |WHERE n_common::DOUBLE / (ca.n_sh + cb.n_sh - n_common) >= 0.5
              |ORDER BY id_a, id_b""".stripMargin)),

    Q("dedup_simhash",
      "16-bit SimHash signatures from word-level md5 nibbles: one explode " +
        "+ one 16-way aggregation; pairs at scale come from " +
        "bit_count(xor) ≤ r (Dedup.simhashPairs).",
      (s, d) => Dedup.simhash16(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id"),
      Some(s"""WITH $simhash16Ctes
              |SELECT doc_id, simhash FROM shsig ORDER BY doc_id""".stripMargin)),

    Q("dedup_embedding",
      "Embedding-cosine near-dup pairs blocked by the cluster column " +
        "(IVF-style: only intra-cluster pairs are scored); decimal-exact " +
        "dot products keep it bit-reproducible.",
      (s, d) => Dedup.embeddingNearDups(Tables.embeddings(s, d),
          "vec_id", "embedding", "label", threshold = 0.4)
        .orderBy("id_a", "id_b"),
      Some(s"""WITH nrm AS (
              |  SELECT vec_id, label, embedding,
              |         sqrt(${dotSql("embedding", "embedding")}) AS nrm
              |  FROM embeddings, generate_series(1, 64) g(i)
              |  GROUP BY vec_id, label, embedding),
              |pairs AS (
              |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
              |         a.embedding AS ea, b.embedding AS eb, a.nrm AS na, b.nrm AS nb
              |  FROM nrm a JOIN nrm b ON a.label = b.label AND a.vec_id < b.vec_id),
              |dots AS (
              |  SELECT id_a, id_b, ${dotSql("ea", "eb")} AS dot, na, nb
              |  FROM pairs, generate_series(1, 64) g(i)
              |  GROUP BY id_a, id_b, na, nb)
              |SELECT id_a, id_b, dot / (na * nb) AS cos_sim
              |FROM dots
              |WHERE dot / (na * nb) >= 0.4
              |ORDER BY id_a, id_b""".stripMargin)),

    Q("sim_topk",
      "Brute-force cosine top-k against a stored query vector: narrow " +
        "per-row map + TakeOrderedAndProject (per-partition top-k, driver " +
        "merge — no global sort).",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val q = Similarity.vectorOf(emb, "vec_id", "embedding", 0L)
        Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 10)
      },
      Some(s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
              |nq AS (
              |  SELECT sqrt(${dotSql("qe", "qe")}) AS nrm
              |  FROM q, generate_series(1, 64) g(i)),
              |ne AS (
              |  SELECT vec_id, sqrt(${dotSql("embedding", "embedding")}) AS nrm
              |  FROM embeddings, generate_series(1, 64) g(i) GROUP BY vec_id),
              |dots AS (
              |  SELECT e.vec_id, ${dotSql("e.embedding", "q.qe")} AS dot
              |  FROM embeddings e, q, generate_series(1, 64) g(i)
              |  GROUP BY e.vec_id)
              |SELECT d.vec_id, d.dot / (ne.nrm * nq.nrm) AS cos_sim
              |FROM dots d JOIN ne ON d.vec_id = ne.vec_id, nq
              |ORDER BY cos_sim DESC, d.vec_id
              |LIMIT 10""".stripMargin)),

    Q("sim_ivf",
      "IVF ANN: exact per-cluster centroids (tiny aggregate), rank " +
        "clusters by centroid cosine, probe only the top nprobe clusters " +
        "via a broadcast semi-join — the 100TB path where probing prunes " +
        "partitions at the scan.",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val q = Similarity.vectorOf(emb, "vec_id", "embedding", 0L)
        Similarity.ivfTopK(emb, "vec_id", "embedding", "label", q, k = 10, nprobe = 3)
      },
      Some(s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
              |nq AS (
              |  SELECT sqrt(${dotSql("qe", "qe")}) AS nrm
              |  FROM q, generate_series(1, 64) g(i)),
              |cent AS (
              |  SELECT label, i,
              |         cast(sum(cast(embedding[i]::DOUBLE AS DECIMAL(38,14))) AS DOUBLE) / count(*) AS c
              |  FROM embeddings, generate_series(1, 64) g(i)
              |  GROUP BY label, i),
              |cdot AS (
              |  SELECT c.label,
              |         cast(sum(cast(c.c * q.qe[c.i]::DOUBLE AS DECIMAL(38,14))) AS DOUBLE) AS dot,
              |         sqrt(cast(sum(cast(c.c * c.c AS DECIMAL(38,14))) AS DOUBLE)) AS cn
              |  FROM cent c, q GROUP BY c.label),
              |short AS (
              |  SELECT label FROM cdot, nq
              |  ORDER BY dot / (cn * nq.nrm) DESC, label LIMIT 3),
              |ne AS (
              |  SELECT vec_id, label, sqrt(${dotSql("embedding", "embedding")}) AS nrm
              |  FROM embeddings, generate_series(1, 64) g(i) GROUP BY vec_id, label),
              |dots AS (
              |  SELECT e.vec_id, e.label, ${dotSql("e.embedding", "q.qe")} AS dot
              |  FROM embeddings e, q, generate_series(1, 64) g(i)
              |  GROUP BY e.vec_id, e.label)
              |SELECT d.vec_id, d.dot / (ne.nrm * nq.nrm) AS cos_sim
              |FROM dots d JOIN ne ON d.vec_id = ne.vec_id, nq
              |WHERE d.label IN (SELECT label FROM short)
              |ORDER BY cos_sim DESC, d.vec_id
              |LIMIT 10""".stripMargin)),

    Q("sim_lsh",
      "SRP-LSH bucketed ANN: 4 md5-derived signed-random-projection bits " +
        "hash every vector to one of 16 buckets; the search touches only " +
        "the query's bucket. Data-independent partition — the 100TB layout " +
        "is PARTITIONED BY bucket, so one query probes one partition.",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val q = Similarity.vectorOf(emb, "vec_id", "embedding", 0L)
        Similarity.srpTopK(emb, "vec_id", "embedding", q, k = 10, nPlanes = 4)
      },
      Some(s"""WITH planes AS (
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
              |members AS (
              |  SELECT e.vec_id, e.embedding
              |  FROM embeddings e JOIN buckets b ON e.vec_id = b.vec_id, qbucket
              |  WHERE b.bucket = qbucket.bucket),
              |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
              |nq AS (
              |  SELECT sqrt(${dotSql("qe", "qe")}) AS nrm
              |  FROM q, generate_series(1, 64) g(i)),
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

    Q("ta_langid",
      "Language-ID by marker-word frequency, reported as a (lang × " +
        "predicted) confusion matrix — pure expression argmax, one " +
        "aggregation.",
      (s, d) => Tables.documents(s, d)
        .select(col("lang"), TextAnalysis.predictLang(col("text")).as("pred_lang"))
        .groupBy("lang", "pred_lang").agg(count(lit(1)).as("n"))
        .orderBy("lang", "pred_lang"),
      Some {
        val langs = TextAnalysis.defaultMarkers
        def score(m: String) =
          s"((length(text) - length(replace(text, '$m', ''))) / ${m.length}::DOUBLE)"
        val scoreDefs = langs.map { case (l, m) => s"${score(m)} AS s_$l" }.mkString(",\n    ")
        val pred = langs.init.foldRight(s"'${langs.last._1}'") { case ((l, _), rest) =>
          val conds = langs.filter(_._1 != l).map(o => s"s_$l >= s_${o._1}").mkString(" AND ")
          s"CASE WHEN $conds THEN '$l' ELSE $rest END"
        }
        s"""WITH scored AS (
           |  SELECT lang,
           |    $scoreDefs
           |  FROM documents)
           |SELECT lang, $pred AS pred_lang, count(*) AS n
           |FROM scored
           |GROUP BY 1, 2
           |ORDER BY lang, pred_lang""".stripMargin
      }),

    Q("ta_quality",
      "Per-document quality features (length, punctuation ratio, stopword " +
        "ratio) + composite score in [0,1] — the pre-training corpus " +
        "filter shape; zero-shuffle scan-stage expressions.",
      (s, d) => Tables.documents(s, d).select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        TextAnalysis.tokenCountWs(col("text")).as("n_tokens"),
        TextAnalysis.punctRatio(col("text")).as("punct_ratio"),
        TextAnalysis.stopwordRatio(col("text")).as("stop_ratio"),
        TextAnalysis.qualityScore(col("text")).as("quality"))
        .orderBy("doc_id"),
      Some("""WITH t AS (
             |  SELECT doc_id, text, length(text) AS n_chars,
             |    CASE WHEN trim(text) = '' THEN 0
             |         ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
             |    CASE WHEN length(text) = 0 THEN 0.0::DOUBLE
             |         ELSE length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) / length(text) END AS punct_ratio,
             |    ((length(text) - length(replace(text, ' the ', ''))) / 5::DOUBLE
             |      + (length(text) - length(replace(text, ' a ', ''))) / 3::DOUBLE) AS stop_hits
             |  FROM documents),
             |t2 AS (
             |  SELECT doc_id, n_chars, n_tokens, punct_ratio,
             |    CASE WHEN n_tokens = 0 THEN 0.0::DOUBLE ELSE stop_hits / n_tokens END AS stop_ratio
             |  FROM t)
             |SELECT doc_id, n_chars, n_tokens, punct_ratio, stop_ratio,
             |  least(n_chars / 500.0::DOUBLE, 1.0::DOUBLE) * 0.4::DOUBLE
             |    + (1.0::DOUBLE - punct_ratio) * 0.3::DOUBLE
             |    + least(stop_ratio * 4.0::DOUBLE, 1.0::DOUBLE) * 0.3::DOUBLE AS quality
             |FROM t2
             |ORDER BY doc_id""".stripMargin)),

    Q("ta_tokens",
      "Token counting two ways — whitespace and BPE-ish regex (letter " +
        "runs / digit runs / punctuation marks) — plus chars-per-token.",
      (s, d) => Tables.documents(s, d).select(
        col("doc_id"),
        TextAnalysis.tokenCountWs(col("text")).as("n_tokens_ws"),
        TextAnalysis.tokenCountRegex(col("text")).as("n_tokens_re"),
        (length(col("text")) / TextAnalysis.tokenCountWs(col("text")))
          .as("chars_per_token"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  CASE WHEN trim(text) = '' THEN 0
             |       ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens_ws,
             |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_tokens_re,
             |  length(text) / (CASE WHEN trim(text) = '' THEN 0
             |       ELSE len(string_split_regex(trim(text), '\s+')) END)::DOUBLE AS chars_per_token
             |FROM documents
             |ORDER BY doc_id""".stripMargin)),

    Q("ta_fingerprint",
      "Document fingerprinting: md5 of normalized text (exact-dedup key) " +
        "+ min-shingle-hash (winnowing-style robust fingerprint that " +
        "survives small edits).",
      (s, d) => {
        val clean = TextOps.cleanMsg(col("text"))
        Tables.documents(s, d).select(
          col("doc_id"),
          md5(clean).as("fp_md5"),
          // fused codegen'd pass (graft.functions.MinShingleMd5) — the
          // array_min(transform(charShingles(..), md5)) Column form is
          // interpreted per element (18.2 s of the round-11 sf0.1
          // bench); MinShingleMd5Spec asserts bit-equality against it
          graft.functions.MinShingleMd5(clean, 16).as("fp_robust"))
          .orderBy("doc_id")
      },
      Some(s"""WITH c AS (SELECT doc_id, $cleanSql AS msg FROM documents)
              |SELECT doc_id, md5(msg) AS fp_md5,
              |       list_min(list_transform(${shingleSql("msg", 16)}, s -> md5(s))) AS fp_robust
              |FROM c
              |ORDER BY doc_id""".stripMargin)),

    Q("ev_json",
      "JSON property parsing (from_json to a typed struct) + per-type " +
        "aggregate over the events table.",
      (s, d) => Tables.events(s, d)
        .withColumn("k", from_json(col("props"),
          StructType(Seq(StructField("k", LongType)))).getField("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("k")).as("sum_k"),
          (sum(col("k")).cast("double") / count(lit(1))).as("avg_k"),
          OracleCompat.dsum(col("value")).as("sum_value"))
        .orderBy("event_type"),
      // DuckDB sum(BIGINT) widens to HUGEINT (int128) which the driver's
      // pandas bridge reads as float64; Spark's sum(long) stays int64.
      // Cast the oracle back to BIGINT so both sides hash as integers.
      Some("""SELECT event_type, count(*) AS n,
             |  cast(sum(cast(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             |  sum(cast(json_extract_string(props, '$.k') AS BIGINT))::DOUBLE / count(*) AS avg_k,
             |  cast(sum(cast(value AS DECIMAL(28,8))) AS DOUBLE) AS sum_value
             |FROM events
             |GROUP BY event_type
             |ORDER BY event_type""".stripMargin)),

    Q("ev_window",
      "Tumbling 1-hour window aggregation over event time (batch plan of " +
        "the streaming query below).",
      (s, d) => EventStream.windowedAggBatch(s, d)
        .orderBy("hour_start", "event_type"),
      Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
             |  event_type, count(*) AS n,
             |  cast(sum(cast(value AS DECIMAL(28,8))) AS DOUBLE) AS sum_value
             |FROM events
             |GROUP BY 1, 2
             |ORDER BY hour_start, event_type""".stripMargin)),

    Q("ev_sessionize",
      "Sessionization with a 30-minute inactivity gap via the built-in " +
        "session_window operator (batch plan of the same stateful shape " +
        "Structured Streaming runs); oracle restates it as the classic " +
        "lag + cumulative-sum window formulation — two independent " +
        "definitions, one result.",
      (s, d) => graft.ops.EventOps.sessionize(Tables.events(s, d),
          "user_id", "ts", "value")
        .orderBy("user_id", "session_start_us"),
      Some("""WITH g AS (
             |  SELECT user_id, epoch_us(ts) AS us, value,
             |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
             |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
             |         THEN 1 ELSE 0 END AS new_sess
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |sess AS (
             |  SELECT user_id, us, value,
             |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY us
             |      ROWS UNBOUNDED PRECEDING) AS session_id
             |  FROM g)
             |SELECT user_id, min(us) AS session_start_us, count(*) AS n_events,
             |       max(us) - min(us) AS duration_us,
             |       cast(sum(cast(value AS DECIMAL(28,8))) AS DOUBLE) AS sum_value
             |FROM sess
             |GROUP BY user_id, session_id
             |ORDER BY user_id, session_start_us""".stripMargin)),

    Q("stream_window",
      "The SAME windowed aggregation executed as a real Structured " +
        "Streaming query (readStream → watermark → window agg → memory " +
        "sink, driven to completion) — checked against the identical " +
        "batch oracle: stream ≡ batch.",
      (s, d) => EventStream.runWindowedStream(s, d)
        .orderBy("hour_start", "event_type"),
      Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
             |  event_type, count(*) AS n,
             |  cast(sum(cast(value AS DECIMAL(28,8))) AS DOUBLE) AS sum_value
             |FROM events
             |GROUP BY 1, 2
             |ORDER BY hour_start, event_type""".stripMargin)),

    Q("mm_meta",
      "Multimodal metadata with a REAL image codec: each doc_id becomes a " +
        "genuine ImageIO-encoded solid-gray PNG (dimensions/fill are pure " +
        "functions of the id), then extractMeta decodes it with " +
        "javax.imageio and reports the decoded width/height/format and an " +
        "md5 over the raw pixel bytes. PNG is lossless, so DuckDB predicts " +
        "every decoded value without a codec: md5(repeat(chr(gray), w*h)).",
      (s, d) => Multimodal.extractMeta(
          Multimodal.imageFixture(
            Tables.documents(s, d).select(col("doc_id")), "doc_id"),
          "payload")
        .select(col("doc_id"), col("meta.width"), col("meta.height"),
          col("meta.format"), col("meta.pixel_md5"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  CAST(4 + doc_id % 13 AS BIGINT) AS width,
             |  CAST(4 + (doc_id * 7) % 17 AS BIGINT) AS height,
             |  'png' AS format,
             |  md5(repeat(chr(CAST(32 + doc_id % 64 AS INT)),
             |      CAST((4 + doc_id % 13) * (4 + (doc_id * 7) % 17) AS INT)))
             |    AS pixel_md5
             |FROM documents
             |ORDER BY doc_id""".stripMargin)))
}
