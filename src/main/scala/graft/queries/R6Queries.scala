package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.{Curation, Dedup, Similarity}

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
          |ORDER BY fp""".stripMargin))
  )
}
