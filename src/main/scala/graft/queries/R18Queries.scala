package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{Curation, Graphs, TextAnalysis}

/** Round-9 session-3, batch 4: node2vec-biased walks, winnowing
  * fingerprints (the MOSS span-dedup primitive), and temperature-scaled
  * mixture weights with exact largest-remainder allocation.
  */
object R18Queries {

  private val WalkLen = 3
  private val MixBudget = 10000L

  val all: Seq[Q] = Seq(

    Q("graph_walks_biased",
      "node2vec-biased walks (Grover & Leskovec 2016) over the near-dup " +
        "graph: the step-k successor maximizes weight/u — priority " +
        "sampling's exact substitute for the weighted RNG draw — with " +
        "the second-order weight 1/p for returning to the previous " +
        "node, 1 for closing a triangle, 1/q for moving outward " +
        "(p=2, q=1/2: all weights exact powers of two; u is the " +
        "md5-uniform, one IEEE division). Per step: frontier joins the " +
        "cached pre-partitioned edges on cur, ONE extra co-partitioned " +
        "probe on (prev, candidate) supplies the triangle test, and " +
        "max_by partial-aggregates the argmax — state stays one row " +
        "per walk. Oracle replays every biased choice with arg_max " +
        "over the identical priorities.",
      (s, d) => Graphs.biasedWalks(
        graft.ops.Dedup.minhashCandidates(Tables.documents(s, d),
          "doc_id", "text", graft.ops.Dedup.Shingler.words(5),
          bandsN = 2, rowsPerBand = 3),
        "id_a", "id_b", length = WalkLen),
      Some {
        val steps = (1 to WalkLen).map { k =>
          s"""c$k AS (
             |  SELECT p.walk_id, p.node AS cur, e.dst,
             |    (CASE WHEN e.dst = p.prev THEN 0.5
             |          WHEN t.src IS NOT NULL THEN 1.0
             |          ELSE 2.0 END) /
             |    ((('0x' || substring(md5(p.walk_id::VARCHAR || ':$k:' ||
             |        e.dst::VARCHAR), 1, 8))::BIGINT + 1)
             |      / 4294967296.0) AS pri
             |  FROM s${k - 1} p
             |  JOIN edges e ON e.src = p.node
             |  LEFT JOIN edges t ON t.src = p.prev AND t.dst = e.dst),
             |s$k AS (
             |  SELECT walk_id, cur AS prev, arg_max(dst, pri) AS node
             |  FROM c$k GROUP BY walk_id, cur)""".stripMargin
        }.mkString(",\n")
        val rows = (1 to WalkLen).map { k =>
          s"SELECT walk_id, CAST($k AS BIGINT) AS step, node FROM s$k"
        }.mkString("\nUNION ALL ")
        s"""WITH ${ExtQueries.minhashPairCtes},
           |edges AS (
           |  SELECT id_a AS src, id_b AS dst FROM pairs
           |  UNION SELECT id_b, id_a FROM pairs),
           |s0 AS (SELECT DISTINCT src AS walk_id, src AS prev,
           |         src AS node FROM edges),
           |$steps
           |SELECT walk_id, CAST(0 AS BIGINT) AS step, node FROM s0
           |UNION ALL $rows
           |ORDER BY walk_id, step""".stripMargin
      }),

    Q("ta_winnow",
      "Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken " +
        "2003 — the MOSS algorithm): per sliding window of 8 " +
        "consecutive character-16-gram hashes keep the minimum (ties " +
        "leftmost), dedupe — the LOCAL guarantee a global min-hash " +
        "lacks: any shared span of ≥ 23 chars yields a shared selected " +
        "print, so matching prints finds plagiarized/quoted SPANS at " +
        "~2/(w+1) index density. Pure per-row array expressions inside " +
        "codegen, one explode, no shuffle before the output sort; the " +
        "oracle replays selection with a per-window row_number argmin.",
      (s, d) => TextAnalysis.winnow(Tables.documents(s, d),
        "doc_id", "text", k = 16, w = 8),
      Some(s"""WITH c AS (
              |  SELECT doc_id, ${ExtQueries.cleanSql} AS msg
              |  FROM documents),
              |hs AS (
              |  SELECT doc_id,
              |    list_transform(
              |      generate_series(1, greatest(length(msg) - 15, 1)),
              |      i -> md5(substr(msg, i, 16))) AS h
              |  FROM c),
              |st AS (
              |  SELECT doc_id, h,
              |    unnest(generate_series(1, greatest(len(h) - 7, 1))) AS i
              |  FROM hs),
              |wp AS (
              |  SELECT doc_id, i, h,
              |    unnest(generate_series(i, least(i + 7, len(h)))) AS p
              |  FROM st),
              |hv AS (SELECT doc_id, i, p, h[p] AS fp FROM wp),
              |r AS (
              |  SELECT doc_id, i, p, fp, row_number() OVER (
              |    PARTITION BY doc_id, i ORDER BY fp, p) AS rn
              |  FROM hv)
              |SELECT DISTINCT doc_id, p AS pos, fp
              |FROM r WHERE rn = 1
              |ORDER BY doc_id, pos""".stripMargin)),

    Q("doc_mix_temperature",
      "Temperature-scaled language mixture (the mT5/XLM-R α-sampling " +
        "recipe, α = 1/2 so the power is ONE exact sqrt): per-lang " +
        "shares flatten to p^α, renormalize through an ORDERED " +
        "left-fold normalizer (bit-replayable by list_reduce — never " +
        "an unordered double sum), and a 10000-doc budget splits by " +
        "largest-remainder apportionment so integer allocations sum " +
        "to the budget EXACTLY. One map-side-combined count is the " +
        "only corpus-sized work.",
      (s, d) => Curation.temperatureMixture(Tables.documents(s, d),
        "lang", budget = MixBudget),
      Some(s"""WITH c AS (
              |  SELECT lang AS key, count(*) AS n_docs
              |  FROM documents GROUP BY 1),
              |n AS (SELECT CAST(sum(n_docs) AS BIGINT) AS nn FROM c),
              |sc AS (
              |  SELECT key, n_docs,
              |    CAST(n_docs AS DOUBLE) / nn AS share,
              |    sqrt(CAST(n_docs AS DOUBLE) / nn) AS w_temp
              |  FROM c, n),
              |t AS (SELECT list_reduce(list(w_temp ORDER BY key),
              |        (a, b) -> a + b) AS tot FROM sc),
              |b AS (
              |  SELECT key, n_docs, share, w_temp,
              |    w_temp / tot AS mix_weight,
              |    CAST(floor($MixBudget.0 * (w_temp / tot)) AS BIGINT)
              |      AS base,
              |    $MixBudget.0 * (w_temp / tot)
              |      - floor($MixBudget.0 * (w_temp / tot)) AS rem
              |  FROM sc, t),
              |l AS (SELECT $MixBudget - CAST(sum(base) AS BIGINT)
              |        AS leftover FROM b),
              |r AS (
              |  SELECT *, row_number() OVER (ORDER BY rem DESC, key)
              |    AS rk
              |  FROM b)
              |SELECT key, n_docs, share, w_temp, mix_weight,
              |  base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
              |    AS alloc
              |FROM r, l
              |ORDER BY key""".stripMargin)))
}
