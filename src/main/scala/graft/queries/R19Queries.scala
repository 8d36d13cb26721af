package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{EventOps, Retrieval}

/** Round-9 session-3, batch 5: offline retrieval evaluation (nDCG/MRR)
  * and the Markov-chain stationary distribution of the event stream.
  */
object R19Queries {

  private val NdcgK = 10
  private val MarkovIters = 6

  /** The per-rank DCG discounts 1/log2(i+1) as driver-computed literal
    * doubles — Double.toString round-trips, so the SQL parses the
    * identical values and no engine runs a runtime log2.
    */
  private val DcgWeights: Seq[Double] =
    (1 to NdcgK).map(i => 1.0 / (math.log(i + 1.0) / math.log(2.0)))

  val all: Seq[Q] = Seq(

    Q("ta_ndcg",
      "Offline retrieval-quality evaluation: nDCG@10 and MRR@10 of the " +
        "BM25 ranking (ta_bm25's exact scorer) against a graded " +
        "relevance label — distinct query terms present in the " +
        "document (0..3), the deterministic stand-in for editorial " +
        "judgments at the same (id, rel) seam real evals use. DCG " +
        "discounts are driver-computed literal doubles (no runtime " +
        "log2 in either engine), gains are integer·literal products, " +
        "and both DCG folds run in RANK ORDER (aggregate over the " +
        "rank-sorted list ≡ list_reduce) — the whole metric " +
        "hash-checks. The retrieval is the only corpus-sized work; " +
        "the metric runs on ≤k-row bounded relations.",
      (s, d) => Retrieval.ndcgMrrAtK(Tables.documents(s, d),
        "doc_id", "text", Seq("dup", "spark", "vector"), k = NdcgK),
      Some {
        val wtRows = DcgWeights.zipWithIndex
          .map { case (w, i) => s"(${i + 1}, ${w}::DOUBLE)" }
          .mkString(", ")
        s"""WITH base AS MATERIALIZED (
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
           |scored AS MATERIALIZED (
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
           |  LIMIT 15),
           |rels AS MATERIALIZED (
           |  SELECT doc_id,
           |    len(list_intersect(list_distinct(ws),
           |        ['dup', 'spark', 'vector'])) AS rel
           |  FROM base),
           |wts(rank, w) AS (VALUES $wtRows),
           |ranked AS MATERIALIZED (
           |  SELECT doc_id, row_number() OVER (ORDER BY score DESC,
           |    doc_id) AS rank
           |  FROM scored
           |  QUALIFY rank <= $NdcgK),
           |gains AS (
           |  SELECT r.rank, cast(rel AS DOUBLE) * w AS gain, rel
           |  FROM ranked r JOIN rels USING (doc_id)
           |  JOIN wts ON wts.rank = r.rank),
           |dcg AS (
           |  SELECT coalesce(list_reduce(list(gain ORDER BY rank),
           |      (a, b) -> a + b), 0.0) AS dcg,
           |    min(CASE WHEN rel > 0 THEN rank END) AS fr
           |  FROM gains),
           |ideal AS MATERIALIZED (
           |  SELECT rel, row_number() OVER (ORDER BY rel DESC, doc_id)
           |    AS rank
           |  FROM rels
           |  QUALIFY rank <= $NdcgK),
           |idcg AS (
           |  SELECT coalesce(list_reduce(
           |      list(cast(rel AS DOUBLE) * w ORDER BY i.rank),
           |      (a, b) -> a + b), 0.0) AS idcg
           |  FROM ideal i JOIN wts ON wts.rank = i.rank)
           |SELECT CAST($NdcgK AS BIGINT) AS k, dcg, idcg,
           |  CASE WHEN idcg <> 0.0 THEN dcg / idcg END AS ndcg,
           |  coalesce(1.0 / fr, 0.0) AS mrr
           |FROM dcg, idcg""".stripMargin
      }),

    Q("ev_markov_stationary",
      "Stationary distribution of the ev_transitions Markov chain by " +
        "power iteration (6 rounds from uniform; sink states " +
        "self-loop) — the long-run visit share per event type that a " +
        "transition matrix doesn't directly give. The matrix is " +
        "BOUNDED (|types|² rows), so it collects once and the " +
        "iteration is driver-local doubles whose per-state sums fold " +
        "in from-state order — bit-replayed by the oracle's unrolled " +
        "MATERIALIZED CTEs with list_reduce (a zero-mass state " +
        "contributes 0.0 addends; acc+0.0 ≡ acc, so dropped-vs-zero " +
        "cannot diverge). Corpus-sized work is exactly the ONE " +
        "user-keyed exchange ev_transitions already pays.",
      (s, d) => EventOps.markovStationary(Tables.events(s, d),
        "user_id", "ts", "event_type", "event_id", iters = MarkovIters),
      Some {
        val iterCtes = (1 to MarkovIters).map { j =>
          s"""pi$j AS MATERIALIZED (
             |  SELECT pm.to_type AS st,
             |    list_reduce(list(pi.x * pm.p ORDER BY pm.from_type),
             |      (a, b) -> a + b) AS x
             |  FROM pm JOIN pi${j - 1} pi ON pi.st = pm.from_type
             |  GROUP BY pm.to_type)""".stripMargin
        }.mkString(",\n")
        s"""WITH seq AS (
           |  SELECT event_type AS from_type,
           |    lead(event_type) OVER (PARTITION BY user_id
           |      ORDER BY ts, event_id) AS to_type
           |  FROM events),
           |tc AS (
           |  SELECT from_type, to_type, count(*) AS n
           |  FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2),
           |probs AS MATERIALIZED (
           |  SELECT from_type, to_type,
           |    cast(n AS DOUBLE) /
           |      cast(sum(n) OVER (PARTITION BY from_type) AS DOUBLE)
           |      AS p
           |  FROM tc),
           |states AS MATERIALIZED (
           |  SELECT from_type AS st FROM probs
           |  UNION SELECT to_type FROM probs),
           |pm AS MATERIALIZED (
           |  SELECT from_type, to_type, p FROM probs
           |  UNION ALL
           |  SELECT st, st, 1.0::DOUBLE FROM states
           |  WHERE st NOT IN (SELECT from_type FROM probs)),
           |kk AS (SELECT count(*) AS k FROM states),
           |pi0 AS MATERIALIZED (
           |  SELECT st, 1.0::DOUBLE / k AS x FROM states, kk),
           |$iterCtes
           |SELECT s.st AS event_type,
           |  coalesce(pf.x, 0.0) AS stationary
           |FROM states s LEFT JOIN pi$MarkovIters pf ON pf.st = s.st
           |ORDER BY event_type""".stripMargin
      }))
}
