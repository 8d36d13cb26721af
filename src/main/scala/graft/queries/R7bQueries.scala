package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.Retrieval

/** Index LIFECYCLE queries — the maintenance story a 100 TB serving
  * index actually lives: appends arrive ([[Retrieval.appendToIndex]],
  * r6), deletes arrive (right-to-be-forgotten — a rebuild per GDPR
  * request is not an answer at scale), tombstones and small batch files
  * accumulate, compaction folds them back into one laid-out batch, and
  * vacuum reclaims the superseded directories. Each step is
  * crash-safe/idempotent (RetrievalSpec pins every crash point); these
  * queries put the END STATE of each lifecycle stage under the DuckDB
  * hash gate, defined against a from-scratch build over the surviving
  * corpus — the strongest equivalence the lifecycle can claim.
  *
  * `stream_index` closes the loop with Structured Streaming: micro-batch
  * ingest maintains the same index via foreachBatch + idempotent batch
  * appends (replay-under-same-id ⇒ exactly-once), serving ≡ batch build.
  */
object R7bQueries {

  private val Terms = Seq("dup", "spark", "vector")

  /** The ta_bm25 oracle parameterized by a corpus predicate: BM25 with
    * the log-free Robertson idf over `documents WHERE <pred>` — the
    * rebuild-equivalence definition the lifecycle queries are gated on.
    */
  private def bm25Sql(pred: String): String =
    s"""WITH base AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(trim(text), '\\s+'),
       |                x -> x <> '') AS ws
       |  FROM documents
       |  WHERE $pred),
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
       |LIMIT 15""".stripMargin

  private def scratch(prefix: String, d: String): String =
    sys.props.getOrElse("java.io.tmpdir", "/tmp") +
      "/" + prefix + "_" + d.replaceAll("[^A-Za-z0-9.]", "_")

  val all: Seq[Q] = Seq(

    Q("ta_bm25_delete",
      "Tombstone deletes from the at-rest BM25 index: build the full " +
        "index, delete doc_id % 7 = 3 as one tombstone batch (no " +
        "postings rewritten — each deleted doc contributes an (id, dl) " +
        "row captured in ONE postings scan), serve. The serve path " +
        "anti-joins tombstones AFTER term pruning (only the query " +
        "terms' postings enter the join) and subtracts the captured " +
        "lengths from the exact-integer corpus stats, so df, avgdl and " +
        "N all shift exactly as a rebuild's would. Oracle: BM25 over " +
        "documents WHERE doc_id % 7 <> 3 — rebuild-equivalence is the " +
        "gated definition, not a claim.",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val path = scratch("graft_bm25_del", d)
        Retrieval.writeIndex(docs, "doc_id", "text", path)
        Retrieval.deleteFromIndex(
          docs.filter(col("doc_id") % 7 === 3).select("doc_id"),
          "doc_id", path, batchId = 1L)
        Retrieval.bm25FromIndex(s, path, "doc_id", Terms, topK = 15)
      },
      Some(bm25Sql("doc_id % 7 <> 3"))),

    Q("ta_bm25_lifecycle",
      "The full index lifecycle under one gate: build on doc_id % 4 <> " +
        "1, append the held-out quarter (batch 1), tombstone-delete " +
        "doc_id % 7 = 3 (del 2), COMPACT everything into one laid-out " +
        "batch (3) — committed by ONE atomic marker rename that both " +
        "reveals the new batch and supersedes the old set — then VACUUM " +
        "the superseded directories, and serve from what remains: a " +
        "single-batch index physically identical in layout to a fresh " +
        "build. Oracle: BM25 over the surviving corpus (% 7 <> 3). " +
        "Every crash point in the chain is RetrievalSpec-pinned.",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val path = scratch("graft_bm25_lc", d)
        Retrieval.writeIndex(docs.filter(col("doc_id") % 4 =!= 1),
          "doc_id", "text", path)
        Retrieval.appendToIndex(docs.filter(col("doc_id") % 4 === 1),
          "doc_id", "text", path, batchId = 1L)
        Retrieval.deleteFromIndex(
          docs.filter(col("doc_id") % 7 === 3).select("doc_id"),
          "doc_id", path, batchId = 2L)
        Retrieval.compactIndex(s, path, "doc_id", newBatchId = 3L)
        Retrieval.vacuumIndex(s, path)
        Retrieval.bm25FromIndex(s, path, "doc_id", Terms, topK = 15)
      },
      Some(bm25Sql("doc_id % 7 <> 3"))),

    Q("sim_ivf_lifecycle",
      "The vector-index lifecycle under one gate (the ta_bm25_lifecycle " +
        "chain on the IVF layout): build on vec_id % 4 <> 1, append the " +
        "held-out quarter against the persisted centroids, tombstone-" +
        "delete vec_id % 9 = 5 (no row rewritten — the probe anti-joins " +
        "AFTER partition pruning, so the join input is the probed " +
        "clusters only), compact batches-minus-tombstones into one " +
        "fresh batch via the shared atomic supersede marker, vacuum, " +
        "probe. Oracle: the sim_ivf_append chain (train on the subset, " +
        "assign/probe the full union) minus the deleted ids — " +
        "rebuild-over-survivors is the gated definition on this index " +
        "too. Every crash point SimilaritySpec-pinned.",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val q = graft.ops.Similarity.vectorOf(emb, "vec_id", "embedding", 0L)
        val path = scratch("graft_ivf_lc", d)
        graft.ops.Similarity.ivfWriteLayout(
          emb.filter(col("vec_id") % 4 =!= 1), "vec_id", "embedding", path,
          kClusters = R5Queries.K, iters = R5Queries.ITERS)
        graft.ops.Similarity.ivfAppendLayout(
          emb.filter(col("vec_id") % 4 === 1), "vec_id", "embedding", path,
          batchId = 1L)
        graft.ops.Similarity.ivfDeleteLayout(
          emb.filter(col("vec_id") % 9 === 5).select("vec_id"), "vec_id",
          path, batchId = 2L)
        graft.ops.Similarity.ivfCompactLayout(s, path, "vec_id",
          newBatchId = 3L)
        graft.ops.Similarity.ivfVacuumLayout(s, path)
        graft.ops.Similarity.ivfProbeLayout(s, path, q, k = 10, nprobe = 2)
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
           |  AND d.vec_id % 9 <> 5
           |ORDER BY cos_sim DESC, d.vec_id
           |LIMIT 10""".stripMargin)),

    Q("stream_index",
      "Structured Streaming maintains the at-rest BM25 index: document " +
        "file stream → foreachBatch → appendToIndex with the " +
        "micro-batch id as the index batch id. Streaming replays a " +
        "failed micro-batch under the SAME id and the append retry " +
        "overwrites exactly its own batch subdirectories — the two " +
        "idempotency layers compose to exactly-once index maintenance. " +
        "Serving the streamed index ≡ a batch build over the same " +
        "corpus, so ta_bm25's oracle applies verbatim (the stream ≡ " +
        "batch contract every streaming query here is gated on).",
      (s, d) => {
        val path = graft.streaming.EventStream.runIndexIngestStream(
          s, d, scratch("graft_stream_idx", d))
        Retrieval.bm25FromIndex(s, path, "doc_id", Terms, topK = 15)
      },
      Some(bm25Sql("TRUE")))
  )
}
