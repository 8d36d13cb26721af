package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{Dedup, Graphs}

/** Round-9 session-6, batch 8: graph shape readout, code-vs-prose
  * signal, and completeness-by-slice.
  */
object R29Queries {

  val all: Seq[Q] = Seq(

    Q("graph_degree_dist",
      "Degree distribution of the near-dup graph - the one-page shape " +
        "readout next to graph_assortativity's one number: nodes per " +
        "degree and their share (one division per degrees-sized row). " +
        "Heavy-tailed = hub/boilerplate structure, concentrated = " +
        "uniform duplicate families. One degree count + one tiny " +
        "regroup.",
      (s, d) => Graphs.degreeDistribution(
        Dedup.minhashCandidates(Tables.documents(s, d), "doc_id", "text",
          Dedup.Shingler.words(5), bandsN = 2, rowsPerBand = 3),
        "id_a", "id_b"),
      Some(s"""WITH ${R14Queries.edgeCtes},
              |deg AS (SELECT src, count(*) AS d FROM edges
              |        GROUP BY src),
              |dist AS (SELECT d AS degree, count(*) AS n_nodes
              |         FROM deg GROUP BY d),
              |tot AS (SELECT CAST(sum(n_nodes) AS BIGINT) AS t
              |        FROM dist)
              |SELECT degree, n_nodes,
              |  CAST(n_nodes AS DOUBLE) / CAST(t AS DOUBLE) AS share
              |FROM dist, tot ORDER BY degree""".stripMargin)),

    Q("ta_code_ratio",
      "Code-vs-prose signal per source - the corpus-mix check a " +
        "pretraining pipeline runs before assuming its text is prose: " +
        "per doc, structural-symbol count ({}();=<>[] backtick pipe) " +
        "and alphabetic count from two regexp_extract_all lengths; " +
        "per source, exact sums plus the symbol share (one division) " +
        "and docs flagged code-like when symbols*20 > alpha " +
        "(cross-multiplied integers, no threshold double). Pure " +
        "scan-stage expressions + one keyed aggregate.",
      (s, d) => {
        val sym = size(regexp_extract_all(col("text"),
          lit("[{}();=<>\\[\\]`|]"), lit(0)))
        val alpha = size(regexp_extract_all(lower(col("text")),
          lit("[a-z]"), lit(0)))
        Tables.documents(s, d)
          .select(col("source"), sym.as("__s"), alpha.as("__a"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("__s").cast("long")).as("n_symbols"),
            sum(col("__a").cast("long")).as("n_alpha"),
            sum(when(col("__s") * 20 > col("__a"), 1L).otherwise(0L))
              .as("n_codelike"))
          .select(col("source"), col("n_docs"), col("n_symbols"),
            col("n_alpha"), col("n_codelike"),
            (col("n_symbols").cast("double") /
              (col("n_symbols") + col("n_alpha")).cast("double"))
              .as("symbol_share"))
          .orderBy(col("source"))
      },
      Some("""WITH d AS (
             |  SELECT source,
             |    len(regexp_extract_all(text, '[{}();=<>\[\]`|]')) AS s,
             |    len(regexp_extract_all(lower(text), '[a-z]')) AS a
             |  FROM documents)
             |SELECT source, count(*) AS n_docs,
             |  CAST(sum(s) AS BIGINT) AS n_symbols,
             |  CAST(sum(a) AS BIGINT) AS n_alpha,
             |  CAST(sum(CASE WHEN s * 20 > a THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_codelike,
             |  CAST(sum(s) AS DOUBLE) / CAST(sum(s) + sum(a) AS DOUBLE)
             |    AS symbol_share
             |FROM d GROUP BY source ORDER BY source""".stripMargin)),

    Q("dq_completeness",
      "Completeness by slice - null counts of every audited column " +
        "per source in ONE conditional-aggregation pass (never a scan " +
        "per column), the sliced drill-down of dq_profile's global " +
        "null rates: when the global rate moves, this says WHICH feed " +
        "broke. All exact integers.",
      (s, d) => Tables.documents(s, d)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("text").isNull, 1L).otherwise(0L))
            .as("null_text"),
          sum(when(col("lang").isNull, 1L).otherwise(0L))
            .as("null_lang"),
          sum(when(col("n_chars").isNull, 1L).otherwise(0L))
            .as("null_n_chars"))
        .orderBy(col("source")),
      Some("""SELECT source, count(*) AS n_rows,
             |  CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END)
             |    AS BIGINT) AS null_text,
             |  CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END)
             |    AS BIGINT) AS null_lang,
             |  CAST(sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END)
             |    AS BIGINT) AS null_n_chars
             |FROM documents GROUP BY source
             |ORDER BY source""".stripMargin)))
}
