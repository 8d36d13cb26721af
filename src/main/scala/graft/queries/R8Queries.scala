package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.{Retrieval, Similarity}

/** Round-7 batch 5: hybrid retrieval (the RAG-curation primitive the
  * sparse and dense halves were built for) plus the remaining selection
  * policies of a production curation stack (north-star extension surface;
  * the reference has none of these).
  */
object R8Queries {

  private val QueryTerms = Seq("dup", "spark", "vector")

  private def dotSql(a: String, b: String): String =
    s"cast(sum(cast($a[i]::DOUBLE * $b[i]::DOUBLE AS DECIMAL(38,14))) AS DOUBLE)"

  /** The ta_bm25 scoring pipeline as CTEs ending in a ranked `sparse`
    * relation (doc_id, rank_a) — the oracle restatement of
    * `rankBounded(bm25(...))`. Kept textually beside the dense CTEs so
    * the fused oracle can never drift from the two gated halves.
    */
  private def sparseCtes(topK: Int): String =
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
  private def denseCtes(topK: Int): String =
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
              |LIMIT 10""".stripMargin)))
}
