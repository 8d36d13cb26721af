package graft.queries

import graft.core.Tables
import graft.ops.Dedup

/** Round-10: exact duplicated-substring spans (Lee et al. 2021
  * ExactSubstr, relational form) — span rows and the per-source
  * trimming-policy readout.
  */
object R31Queries {

  private val K = 8

  // shared oracle CTEs: positional word-8-gram MD5s, corpus-repeated
  // hashes, duplicated positions merged into maximal intervals
  // (new span iff the lag gap exceeds k — overlap-or-touch merge)
  private def spanCtes: String =
    s"""WITH w AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
       |  FROM documents),
       |pos AS (
       |  SELECT doc_id, i AS pos,
       |    md5(array_to_string(w[i:i+${K - 1}], ' ')) AS h
       |  FROM w, unnest(generate_series(1, len(w) - ${K - 1})) AS g(i)
       |  WHERE len(w) >= $K),
       |dup AS (SELECT h FROM pos GROUP BY h HAVING count(*) > 1),
       |dp AS (SELECT p.doc_id, p.pos FROM pos p
       |       WHERE p.h IN (SELECT h FROM dup)),
       |flag AS (
       |  SELECT doc_id, pos,
       |    CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
       |           IS NULL
       |      OR pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
       |           > $K
       |    THEN 1 ELSE 0 END AS brk
       |  FROM dp),
       |isl AS (
       |  SELECT doc_id, pos,
       |    sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
       |  FROM flag),
       |spans AS (
       |  SELECT doc_id, min(pos) AS span_start,
       |    max(pos) + ${K - 1} AS span_end,
       |    CAST(max(pos) + ${K - 1} - min(pos) + 1 AS BIGINT)
       |      AS span_words,
       |    CAST(count(*) AS BIGINT) AS n_kgrams
       |  FROM isl GROUP BY doc_id, island)""".stripMargin

  val all: Seq[Q] = Seq(

    Q("dedup_spans",
      "Exact duplicated-substring spans (Lee et al. 2021 ExactSubstr, " +
        "relational form): per document the MAXIMAL word intervals " +
        "covered by word 8-grams occurring more than once in the " +
        "corpus - the boilerplate/licence/quoted spans inside " +
        "otherwise-unique documents that sequence-level dedup trims. " +
        "One positional-MD5 scan (fixed-width tuples, never text), " +
        "map-side combined count by hash, LEFT-SEMI join back (no " +
        "fan-out on boilerplate hashes), per-doc gaps-and-islands " +
        "interval merge.",
      (s, d) => Dedup.dupSpans(Tables.documents(s, d), "doc_id", "text",
        K),
      Some(s"""$spanCtes
              |SELECT doc_id, span_start, span_end, span_words, n_kgrams
              |FROM spans
              |ORDER BY doc_id, span_start""".stripMargin)),

    Q("dedup_span_frac",
      "Per-source duplicated-span word fraction over dedup_spans - the " +
        "how-much-of-this-source-is-boilerplate number behind per-" +
        "source trimming policy. Maximal spans are disjoint, so " +
        "per-doc duplicated words are a plain sum; slice totals are " +
        "map-side combined aggregates joined on the bounded source key.",
      (s, d) => Dedup.dupSpanFrac(Tables.documents(s, d), "doc_id",
        "text", "source", K),
      Some(s"""$spanCtes,
              |per_doc AS (
              |  SELECT doc_id, sum(span_words) AS dup FROM spans
              |  GROUP BY doc_id),
              |base AS (
              |  SELECT d.doc_id, d.source AS slice,
              |    CAST(len(string_split_regex(trim(d.text), '\\s+'))
              |      AS BIGINT) AS n
              |  FROM documents d)
              |SELECT b.slice, CAST(count(*) AS BIGINT) AS n_docs,
              |  CAST(sum(b.n) AS BIGINT) AS n_words,
              |  CAST(sum(coalesce(p.dup, 0)) AS BIGINT) AS n_dup_words,
              |  CAST(sum(coalesce(p.dup, 0)) AS DOUBLE) /
              |    CAST(sum(b.n) AS DOUBLE) AS dup_frac
              |FROM base b LEFT JOIN per_doc p ON b.doc_id = p.doc_id
              |GROUP BY b.slice
              |ORDER BY b.slice""".stripMargin))
  )
}
