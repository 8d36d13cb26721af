package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.{Curation, Dedup, LmSignals, Similarity, TextAnalysis}

/** Round-6 session queries, closing the VERDICT r5 asks:
  *
  *  - `sim_ivf_layout` puts the AT-REST IVF path (write PARTITIONED BY
  *    trained cluster, probe = partition-pruned scan) under the DuckDB
  *    oracle gate — its result is defined to equal `sim_ivf_trained`, so
  *    that query's unrolled-Lloyd oracle is reused verbatim;
  *  - `sim_kmeans_sampled` proves the documented 100 TB recipe (train the
  *    quantizer on a deterministic hash-sample, assign the full corpus)
  *    runs and oracle-matches, not just that it is described;
  *  - `dedup_substring` is the missing dedup mode: cross-document exact
  *    SUBSTRING (span) removal, the suffix-array method's scalable
  *    k-gram-fingerprint approximation;
  *  - `stream_curation` composes quality-gate → exact-dedup as an
  *    incremental Structured Streaming query (stream ≡ batch oracle, the
  *    `stream_dedup` pattern).
  */
object R6Queries {

  private val SampleThreshold = 16384 // hashBucket < t ⇒ ~25% of ids

  /** The sampled-training Lloyd chain: identical to R5's except every
    * training read (seeds, per-iteration assignment, means) goes against
    * the hash-sampled `tr` relation; the final assignment still runs
    * over the full `embeddings` table.
    */
  private val sampledKmeansCtes: String =
    s"""tr AS (
       |  SELECT vec_id, embedding FROM embeddings
       |  WHERE ('0x' || substring(md5(vec_id::VARCHAR), 1, 4))::BIGINT
       |    < $SampleThreshold),
       |""".stripMargin + R5Queries.kmeansCtesOn("tr")

  val all: Seq[Q] = Seq(

    Q("sim_ivf_layout",
      "The at-rest IVF layout under the oracle gate: ivfWriteLayout " +
        "rewrites the embedding table PARTITIONED BY its trained k-means " +
        "cluster (centroids persisted beside it as exact binary parquet), " +
        "then ivfProbeLayout answers the query from the written layout — " +
        "rank saved centroids, shortlist nprobe clusters, scan ONLY those " +
        "partitions (SimilaritySpec pins selectedPartitions == nprobe). " +
        "By construction the result equals sim_ivf_trained, so that " +
        "query's unrolled-Lloyd oracle applies verbatim.",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val q = Similarity.vectorOf(emb, "vec_id", "embedding", 0L)
        // deterministic per-sf-dir scratch path (overwritten each run)
        val path = sys.props.getOrElse("java.io.tmpdir", "/tmp") +
          "/graft_ivf_layout_" + d.replaceAll("[^A-Za-z0-9.]", "_")
        Similarity.ivfWriteLayout(emb, "vec_id", "embedding", path,
          kClusters = R5Queries.K, iters = R5Queries.ITERS)
        Similarity.ivfProbeLayout(s, path, q, k = 10, nprobe = 2)
      },
      R5Queries.all.find(_.name == "sim_ivf_trained")
        .flatMap(_.oracle)),

    Q("sim_kmeans_sampled",
      "SAMPLE-trained k-means parity — the 100 TB recipe made runnable: " +
        "Lloyd's trains on the deterministic hash-sample " +
        s"(hashBucket(vec_id) < $SampleThreshold ≈ 25% of ids, no RNG " +
        "state), then ONE narrow assignment pass tags the full corpus. " +
        "The oracle replays the unrolled Lloyd chain with every training " +
        "read (seeds, assignments, means) against the same sampled id " +
        "set, so the full-corpus cluster ids hash-match bit-for-bit.",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val train = emb.filter(
          Curation.hashBucket(col("vec_id")) < SampleThreshold)
        Similarity.kmeansAssign(emb, "vec_id", "embedding",
            R5Queries.K, R5Queries.ITERS, outCol = "cluster",
            train = Some(train))
          .select(col("vec_id"), col("cluster"))
          .orderBy("vec_id")
      },
      Some(
        s"""WITH $sampledKmeansCtes
           |SELECT vec_id, cluster FROM a${R5Queries.ITERS + 1}
           |ORDER BY vec_id""".stripMargin)),

    Q("dedup_substring",
      "Cross-document exact SUBSTRING dedup (the suffix-array method of " +
        "Lee et al. 2021, approximated with overlapping k-gram " +
        "fingerprints): every word span of length ≥ 8 that appears in " +
        "≥ 2 distinct documents is removed from all but the minimum-id " +
        "document (first occurrence survives). Four bounded-key shuffles " +
        "— gram-md5 dictionary, co-partitioned coverage join, (doc,pos) " +
        "dedup, per-doc rebuild from the posexplode index; no global " +
        "sort, no suffix array.",
      (s, d) => Dedup.dedupSpans(Tables.documents(s, d),
          "doc_id", "text", k = 8, minDocs = 2)
        .orderBy("doc_id"),
      Some(
        """WITH w AS (
          |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
          |  FROM documents WHERE trim(text) <> ''),
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
          |kept AS (
          |  SELECT wp.doc_id, wp.word, wp.p
          |  FROM wp LEFT JOIN cov ON wp.doc_id = cov.doc_id AND wp.p = cov.p
          |  WHERE cov.p IS NULL),
          |tot AS (
          |  SELECT doc_id,
          |    CASE WHEN trim(text) = '' THEN 0
          |         ELSE len(string_split_regex(trim(text), '\s+')) END AS n
          |  FROM documents)
          |SELECT t.doc_id,
          |  coalesce(string_agg(k.word, ' ' ORDER BY k.p), '') AS clean_text,
          |  CAST(t.n - count(k.word) AS BIGINT) AS n_removed
          |FROM tot t LEFT JOIN kept k USING (doc_id)
          |GROUP BY t.doc_id, t.n
          |ORDER BY t.doc_id""".stripMargin)),

    Q("stream_curation",
      "Streaming curation parity: quality gate (the batch qualityScore " +
        "as a scan-stage expression) feeding streaming exact-dedup " +
        "(dropDuplicates on the text md5) — append mode emits each " +
        "fingerprint once, so incremental ingest keeps the curated " +
        "corpus exactly-once-per-text. Keys-only output ≡ the batch " +
        "DISTINCT-under-quality oracle (the stream_dedup contract).",
      (s, d) => graft.streaming.EventStream.runCurationStream(s, d)
        .orderBy("fp"),
      Some(
        """WITH t AS (
          |  SELECT text, length(text) AS n_chars,
          |    CASE WHEN trim(text) = '' THEN 0
          |         ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
          |    CASE WHEN length(text) = 0 THEN 0.0::DOUBLE
          |         ELSE length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) / length(text) END AS punct_ratio,
          |    ((length(text) - length(replace(text, ' the ', ''))) / 5::DOUBLE
          |      + (length(text) - length(replace(text, ' a ', ''))) / 3::DOUBLE) AS stop_hits
          |  FROM documents),
          |t2 AS (
          |  SELECT text,
          |    least(n_chars / 500.0::DOUBLE, 1.0::DOUBLE) * 0.4::DOUBLE
          |      + (1.0::DOUBLE - punct_ratio) * 0.3::DOUBLE
          |      + least((CASE WHEN n_tokens = 0 THEN 0.0::DOUBLE
          |               ELSE stop_hits / n_tokens END) * 4.0::DOUBLE,
          |              1.0::DOUBLE) * 0.3::DOUBLE AS quality
          |  FROM t)
          |SELECT DISTINCT md5(text) AS fp FROM t2
          |WHERE quality >= 0.5
          |ORDER BY fp""".stripMargin)),

    Q("ta_lmscore",
      "CCNet-shaped statistical-LM quality filter: add-one-smoothed " +
        "bigram model trained on the in-language reference subset " +
        "(lang='en'), every document scored by its MEAN in-context " +
        "bigram probability — a log-free, bit-portable stand-in for " +
        "inverse perplexity (no ln/exp: libm last-ulp drift would break " +
        "the hash gate). The model is min-count capped so it stays " +
        "bounded at any reference size and both scoring joins broadcast.",
      (s, d) => {
        val docs = Tables.documents(s, d)
        LmSignals.bigramLmScore(docs, "doc_id", "text",
            docs.filter(col("lang") === "en"), "text", minCount = 2L)
          .orderBy("doc_id")
      },
      Some(
        """WITH w AS (
          |  SELECT doc_id, lang, string_split_regex(trim(text), '\s+') AS ws
          |  FROM documents),
          |refuni AS (
          |  SELECT word, count(*) AS c1 FROM (
          |    SELECT unnest(ws) AS word FROM w WHERE lang = 'en')
          |  WHERE word <> '' GROUP BY word),
          |vocab AS (SELECT count(*) AS v FROM refuni),
          |refbi AS (
          |  SELECT big, count(*) AS c2 FROM (
          |    SELECT ws[i] || ' ' || ws[i+1] AS big FROM (
          |      SELECT ws, unnest(generate_series(1, len(ws) - 1)) AS i
          |      FROM w WHERE lang = 'en'))
          |  GROUP BY big HAVING count(*) >= 2),
          |docbi AS (
          |  SELECT doc_id, ws[i] AS prefix, ws[i] || ' ' || ws[i+1] AS big
          |  FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 1)) AS i
          |        FROM w)),
          |scored AS (
          |  SELECT doc_id, count(*) AS n_bigrams,
          |    cast(sum(cast((coalesce(c2, 0) + 1)::DOUBLE /
          |      (coalesce(c1, 0) + v)::DOUBLE AS DECIMAL(38,14))) AS DOUBLE)
          |      / count(*) AS lm_score
          |  FROM docbi
          |  LEFT JOIN refbi USING (big)
          |  LEFT JOIN refuni ON docbi.prefix = refuni.word
          |  CROSS JOIN vocab
          |  GROUP BY doc_id)
          |SELECT d.doc_id, coalesce(n_bigrams, 0) AS n_bigrams,
          |       coalesce(lm_score, 0.0::DOUBLE) AS lm_score
          |FROM documents d LEFT JOIN scored USING (doc_id)
          |ORDER BY doc_id""".stripMargin)),

    Q("doc_dsir",
      "DSIR-shaped importance signal (hashed n-gram importance " +
        "resampling, Xie et al. 2023): words hashed to 65536 buckets " +
        "(fixed model size at any vocabulary), target (lang='en') vs " +
        "raw-corpus bucket distributions estimated in ONE conditional " +
        "aggregation pass, each document scored by its mean per-word " +
        "probability contrast toward the target — the linear form of " +
        "the paper's log-ratio, chosen for bit portability. The 65536-" +
        "row contrast dimension broadcasts; the corpus shuffles only " +
        "for the per-doc re-aggregation.",
      (s, d) => LmSignals.dsirContrast(Tables.documents(s, d),
          "doc_id", "text", col("lang") === "en")
        .orderBy("doc_id"),
      Some(
        """WITH tok AS (
          |  SELECT doc_id, is_t, word,
          |         ('0x' || substring(md5(word), 1, 4))::BIGINT AS b
          |  FROM (SELECT doc_id, lang = 'en' AS is_t,
          |               unnest(string_split_regex(trim(text), '\s+')) AS word
          |        FROM documents)
          |  WHERE word <> ''),
          |hist AS (
          |  SELECT b, sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS ct,
          |         count(*) AS cr
          |  FROM tok GROUP BY b),
          |tot AS (SELECT sum(ct) AS tt, sum(cr) AS tr FROM hist),
          |contrast AS (
          |  SELECT b, ct::DOUBLE / tt - cr::DOUBLE / tr AS diff
          |  FROM hist CROSS JOIN tot),
          |scored AS (
          |  SELECT doc_id, count(*) AS n_words,
          |    cast(sum(cast(diff AS DECIMAL(38,14))) AS DOUBLE) / count(*)
          |      AS dsir_score
          |  FROM tok LEFT JOIN contrast USING (b)
          |  GROUP BY doc_id)
          |SELECT d.doc_id, coalesce(n_words, 0) AS n_words,
          |       coalesce(dsir_score, 0.0::DOUBLE) AS dsir_score
          |FROM documents d LEFT JOIN scored USING (doc_id)
          |ORDER BY doc_id""".stripMargin)),

    Q("ta_vocab",
      "Tokenizer-vocabulary construction with corpus coverage: " +
        "whitespace-token frequencies (one map-side-combined " +
        "aggregation — the only corpus-sized shuffle), top-50 via " +
        "TakeOrderedAndProject (never a global sort), then the " +
        "cumulative occurrence-coverage curve computed over the 50 " +
        "survivors only. Ties broken by term so ranks are total.",
      (s, d) => TextAnalysis.vocabCoverage(
        Tables.documents(s, d), "text", topK = 50),
      Some(
        """WITH counts AS (
          |  SELECT word AS term, count(*) AS freq
          |  FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS word
          |        FROM documents)
          |  WHERE word <> '' GROUP BY word),
          |tot AS (SELECT sum(freq) AS total FROM counts),
          |top AS (
          |  SELECT term, freq FROM counts
          |  ORDER BY freq DESC, term LIMIT 50)
          |SELECT row_number() OVER (ORDER BY freq DESC, term) AS rank,
          |  term, freq,
          |  (sum(freq) OVER (ORDER BY freq DESC, term
          |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::DOUBLE
          |    / total AS coverage
          |FROM top CROSS JOIN tot
          |ORDER BY rank""".stripMargin)),

    Q("doc_shards",
      "Seeded deterministic corpus shuffle into training shards: each " +
        "row's reproducible key is md5(seed ':' id); shard = first 4 " +
        "hex digits mod 16, position = key rank WITHIN the shard. One " +
        "hash exchange + per-shard parallel sort — row_number runs over " +
        "partitionBy(shard), never a global window, so no task sees " +
        "more than ~corpus/nShards rows at any scale.",
      (s, d) => Curation.seededShards(Tables.documents(s, d),
          "doc_id", nShards = 16, seed = "r6")
        .select("shard", "pos", "doc_id")
        .orderBy("shard", "pos"),
      Some(
        """WITH keyed AS (
          |  SELECT doc_id, md5('r6:' || doc_id::VARCHAR) AS key,
          |         ('0x' || substring(md5('r6:' || doc_id::VARCHAR), 1, 4))::BIGINT
          |           % 16 AS shard
          |  FROM documents)
          |SELECT shard,
          |  row_number() OVER (PARTITION BY shard ORDER BY key, doc_id) AS pos,
          |  doc_id
          |FROM keyed
          |ORDER BY shard, pos""".stripMargin)),

    Q("doc_curriculum",
      "Curriculum ordering for training: documents bucketed by FIXED " +
        "quality thresholds (scan-local CASE — a rank-based ntile would " +
        "need a global sort, a serialization point at corpus scale), " +
        "cleanest bucket first, seeded md5 order WITHIN each bucket " +
        "(row_number over partitionBy(bucket) — per-bucket parallel " +
        "sort, no global window). Bucket 0 = highest-quality tier.",
      (s, d) => {
        val q = TextAnalysis.qualityScore(col("text"))
        val key = md5(concat(lit("cur:"), col("doc_id").cast("string")))
        val bucket = when(q >= 0.75, 0).when(q >= 0.5, 1)
          .when(q >= 0.25, 2).otherwise(3)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("bucket"))
          .orderBy(col("__key").asc, col("doc_id").asc)
        Tables.documents(s, d)
          .select(col("doc_id"), q.as("quality"), bucket.as("bucket"),
            key.as("__key"))
          .withColumn("pos", row_number().over(w).cast("long"))
          .select("bucket", "pos", "doc_id", "quality")
          .orderBy("bucket", "pos")
      },
      Some(
        """WITH t AS (
          |  SELECT doc_id, length(text) AS n_chars,
          |    CASE WHEN trim(text) = '' THEN 0
          |         ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
          |    CASE WHEN length(text) = 0 THEN 0.0::DOUBLE
          |         ELSE length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) / length(text) END AS punct_ratio,
          |    ((length(text) - length(replace(text, ' the ', ''))) / 5::DOUBLE
          |      + (length(text) - length(replace(text, ' a ', ''))) / 3::DOUBLE) AS stop_hits
          |  FROM documents),
          |t2 AS (
          |  SELECT doc_id,
          |    least(n_chars / 500.0::DOUBLE, 1.0::DOUBLE) * 0.4::DOUBLE
          |      + (1.0::DOUBLE - punct_ratio) * 0.3::DOUBLE
          |      + least((CASE WHEN n_tokens = 0 THEN 0.0::DOUBLE
          |               ELSE stop_hits / n_tokens END) * 4.0::DOUBLE,
          |              1.0::DOUBLE) * 0.3::DOUBLE AS quality
          |  FROM t),
          |b AS (
          |  SELECT doc_id, quality,
          |    CASE WHEN quality >= 0.75 THEN 0 WHEN quality >= 0.5 THEN 1
          |         WHEN quality >= 0.25 THEN 2 ELSE 3 END AS bucket,
          |    md5('cur:' || doc_id::VARCHAR) AS key
          |  FROM t2)
          |SELECT bucket,
          |  row_number() OVER (PARTITION BY bucket ORDER BY key, doc_id) AS pos,
          |  doc_id, quality
          |FROM b
          |ORDER BY bucket, pos""".stripMargin)),

    Q("cdc_scd2",
      "CDC merge / SCD type-2 dimension maintenance without a table " +
        "format: the customer snapshot lifted to a versioned dimension, " +
        "merged with a deterministic change batch (hash-bucketed " +
        "updates, no-op echoes, and brand-new keys). Updated keys close " +
        "their open version at the effective date and a new version is " +
        "born; identical echoes cause NO version churn; new keys " +
        "insert open. One co-partitioned full-outer sort-merge join " +
        "whose exchanges the kept/closed/born branches REUSE, + a " +
        "shuffle-free union with closed history.",
      (s, d) => {
        val cust = Tables.customer(s, d)
          .select("c_custkey", "c_name", "c_acctbal")
        val dim = cust
          .withColumn("valid_from", lit(java.sql.Date.valueOf("2024-01-01")))
          .withColumn("valid_to", lit(null).cast("date"))
        val b = Curation.hashBucket(col("c_custkey"))
        val upd = cust.filter(b < 16384)
          .withColumn("c_acctbal", col("c_acctbal") + 100.0)
        val noop = cust.filter(b >= 16384 && b < 20480)
        val ins = cust.filter(b < 4096).select(
          (col("c_custkey") + 1000000L).as("c_custkey"),
          concat(lit("NEW "), col("c_name")).as("c_name"),
          lit(0.0).as("c_acctbal"))
        val changes = upd.unionByName(noop).unionByName(ins)
        graft.ops.Cdc.scd2Merge(dim, changes, Seq("c_custkey"),
            lit(java.sql.Date.valueOf("2024-06-01")))
          .orderBy(col("c_custkey"), col("valid_from"),
            col("valid_to").asc_nulls_last)
      },
      Some(
        """WITH dim AS (
          |  SELECT c_custkey, c_name, c_acctbal,
          |         DATE '2024-01-01' AS valid_from, CAST(NULL AS DATE) AS valid_to
          |  FROM customer),
          |hb AS (
          |  SELECT c_custkey,
          |         ('0x' || substring(md5(c_custkey::VARCHAR), 1, 4))::BIGINT AS b
          |  FROM customer),
          |upd AS (
          |  SELECT c.c_custkey, c.c_name, c.c_acctbal + 100.0 AS c_acctbal
          |  FROM customer c JOIN hb USING (c_custkey) WHERE hb.b < 16384),
          |noop AS (
          |  SELECT c.c_custkey, c.c_name, c.c_acctbal
          |  FROM customer c JOIN hb USING (c_custkey)
          |  WHERE hb.b >= 16384 AND hb.b < 20480),
          |ins AS (
          |  SELECT c.c_custkey + 1000000 AS c_custkey,
          |         'NEW ' || c.c_name AS c_name, 0.0::DOUBLE AS c_acctbal
          |  FROM customer c JOIN hb USING (c_custkey) WHERE hb.b < 4096),
          |changes AS (
          |  SELECT * FROM upd UNION ALL SELECT * FROM noop
          |  UNION ALL SELECT * FROM ins),
          |kept AS (
          |  SELECT d.c_custkey, d.c_name, d.c_acctbal, d.valid_from, d.valid_to
          |  FROM dim d LEFT JOIN changes ch ON d.c_custkey = ch.c_custkey
          |  WHERE ch.c_custkey IS NULL
          |     OR (d.c_name IS NOT DISTINCT FROM ch.c_name
          |         AND d.c_acctbal IS NOT DISTINCT FROM ch.c_acctbal)),
          |closed AS (
          |  SELECT d.c_custkey, d.c_name, d.c_acctbal, d.valid_from,
          |         DATE '2024-06-01' AS valid_to
          |  FROM dim d JOIN changes ch ON d.c_custkey = ch.c_custkey
          |  WHERE NOT (d.c_name IS NOT DISTINCT FROM ch.c_name
          |             AND d.c_acctbal IS NOT DISTINCT FROM ch.c_acctbal)),
          |born AS (
          |  SELECT ch.c_custkey, ch.c_name, ch.c_acctbal,
          |         DATE '2024-06-01' AS valid_from, CAST(NULL AS DATE) AS valid_to
          |  FROM changes ch LEFT JOIN dim d ON d.c_custkey = ch.c_custkey
          |  WHERE d.c_custkey IS NULL
          |     OR NOT (d.c_name IS NOT DISTINCT FROM ch.c_name
          |             AND d.c_acctbal IS NOT DISTINCT FROM ch.c_acctbal))
          |SELECT * FROM kept
          |UNION ALL SELECT * FROM closed
          |UNION ALL SELECT * FROM born
          |ORDER BY c_custkey, valid_from, valid_to NULLS LAST""".stripMargin))
  )
}
