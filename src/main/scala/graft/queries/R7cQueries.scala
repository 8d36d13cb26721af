package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.WebFilters

/** The named web-corpus filter suites (Gopher/MassiveText rules, C4
  * line cleaning) under the DuckDB gate. The fixture text is a single
  * line, so — the ta_html precedent — each query first RESHAPES it
  * deterministically into lines (8 words per line, every third line
  * closed with a period) in BOTH engines; the line-level rules then
  * have real structure to discriminate on, and every signal stays a
  * pure scan-stage expression.
  */
object R7cQueries {

  /** Deterministic line structure: 8-word lines, '.' every 3rd line. */
  private def chunkLines(text: Column): Column = {
    val ws = filter(split(trim(text), "\\s+"), w => w =!= "")
    val n = size(ws)
    when(n === 0, lit("")).otherwise(
      array_join(
        transform(sequence(lit(0), (ceil(n / lit(8.0)) - 1).cast("int")),
          i => concat(
            array_join(slice(ws, i * lit(8) + 1, lit(8)), " "),
            when(i % 3 === 0, lit(".")).otherwise(lit("")))),
        "\n"))
  }

  /** The identical reshaping in DuckDB (1-based inclusive list slice),
    * plus the word/line splits both rule families read.
    */
  private val LinedCtes =
    s"""w AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(trim(text), '\\s+'),
       |                x -> x <> '') AS ws
       |  FROM documents),
       |lined AS (
       |  SELECT doc_id,
       |    CASE WHEN len(ws) = 0 THEN '' ELSE
       |      array_to_string(
       |        list_transform(
       |          generate_series(0, CAST(ceil(len(ws) / 8.0) AS INT) - 1),
       |          i -> array_to_string(ws[i*8+1 : i*8+8], ' ') ||
       |               CASE WHEN i % 3 = 0 THEN '.' ELSE '' END),
       |        chr(10)) END AS t
       |  FROM w),
       |split AS (
       |  SELECT doc_id, t,
       |    list_filter(string_split_regex(trim(t), '\\s+'),
       |                x -> x <> '') AS tws,
       |    list_filter(list_transform(string_split(t, chr(10)),
       |                               l -> trim(l)),
       |                l -> l <> '') AS ls
       |  FROM lined)""".stripMargin

  /** The Gopher signal oracle, shared by ta_gopher (fused codegen
    * expression) and ta_gopher_colform (WebFilters Column formulation):
    * one contract, two engines-worth of proof that both match it.
    */
  private def gopherOracle: Option[String] = gopherOracle("")

  /** `where` filters the FINAL per-doc signal rows (signals are a pure
    * per-document projection, so filtering output == filtering input).
    */
  private def gopherOracle(where: String): Option[String] =
    Some(
        s"""WITH $LinedCtes,
           |sig AS (
           |  SELECT doc_id,
           |    len(tws)::BIGINT AS n_words,
           |    CASE WHEN len(tws) = 0 THEN 0.0::DOUBLE ELSE
           |      CAST(list_aggregate(list_transform(tws, x -> length(x)),
           |                          'sum') AS DOUBLE) / len(tws) END
           |      AS mean_word_len,
           |    CASE WHEN len(tws) = 0 THEN 0.0::DOUBLE ELSE
           |      ((length(t) - length(replace(t, '#', ''))) +
           |       (length(t) - length(replace(t, '...', ''))) / 3)
           |        / len(tws) END AS symbol_ratio,
           |    CASE WHEN len(tws) = 0 THEN 0.0::DOUBLE ELSE
           |      CAST(len(list_filter(tws,
           |        x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE)
           |        / len(tws) END AS alpha_frac,
           |    (CASE WHEN list_contains(tws, 'the')  THEN 1 ELSE 0 END +
           |     CASE WHEN list_contains(tws, 'be')   THEN 1 ELSE 0 END +
           |     CASE WHEN list_contains(tws, 'to')   THEN 1 ELSE 0 END +
           |     CASE WHEN list_contains(tws, 'of')   THEN 1 ELSE 0 END +
           |     CASE WHEN list_contains(tws, 'and')  THEN 1 ELSE 0 END +
           |     CASE WHEN list_contains(tws, 'that') THEN 1 ELSE 0 END +
           |     CASE WHEN list_contains(tws, 'have') THEN 1 ELSE 0 END +
           |     CASE WHEN list_contains(tws, 'with') THEN 1 ELSE 0 END
           |    )::BIGINT AS stop_hits,
           |    CASE WHEN len(ls) = 0 THEN 0.0::DOUBLE ELSE
           |      CAST(len(list_filter(ls, l -> l LIKE '%...')) AS DOUBLE)
           |        / len(ls) END AS ellipsis_frac,
           |    CASE WHEN len(ls) = 0 THEN 0.0::DOUBLE ELSE
           |      CAST(len(list_filter(ls,
           |        l -> regexp_matches(l, '^[-*•]'))) AS DOUBLE)
           |        / len(ls) END AS bullet_frac,
           |    CASE WHEN len(ls) = 0 THEN 0.0::DOUBLE ELSE
           |      1.0 - CAST(len(list_distinct(ls)) AS DOUBLE) / len(ls) END
           |      AS dup_line_frac,
           |    CASE WHEN len(ls) = 0 OR
           |              list_aggregate(list_transform(ls,
           |                l -> length(l)), 'sum') = 0
           |      THEN 0.0::DOUBLE ELSE
           |      CAST(list_aggregate(list_transform(ls, l -> length(l)),
           |             'sum') -
           |           list_aggregate(list_transform(list_distinct(ls),
           |             l -> length(l)), 'sum') AS DOUBLE) /
           |      list_aggregate(list_transform(ls, l -> length(l)), 'sum')
           |      END AS dup_char_frac
           |  FROM split)
           |SELECT *,
           |  (n_words BETWEEN 50 AND 100000 AND
           |   mean_word_len BETWEEN 3.0 AND 10.0 AND
           |   symbol_ratio < 0.1 AND bullet_frac < 0.9 AND
           |   ellipsis_frac < 0.3 AND alpha_frac > 0.8 AND
           |   stop_hits >= 2 AND dup_line_frac < 0.3 AND
           |   dup_char_frac < 0.2) AS keep,
           |  (n_words BETWEEN 50 AND 100000 AND
           |   mean_word_len BETWEEN 3.0 AND 10.0 AND
           |   symbol_ratio < 0.1 AND bullet_frac < 0.9 AND
           |   ellipsis_frac < 0.3 AND alpha_frac > 0.8 AND
           |   dup_line_frac < 0.3 AND
           |   dup_char_frac < 0.2) AS keep_no_stop
           |FROM sig $where
           |ORDER BY doc_id""".stripMargin)

  val all: Seq[Q] = Seq(

    Q("ta_gopher",
      "The Gopher/MassiveText quality rule suite (Rae et al. 2021 " +
        "A1.1) as ONE codegen'd scan projection — word count, mean " +
        "word length, symbol-to-word ratio, alphabetic-word fraction, " +
        "required-stop-word presence, bullet/ellipsis line fractions, " +
        "duplicate-line and duplicate-line-char fractions, and the " +
        "published-threshold keep decision. Word and line statistics " +
        "stay INSIDE their row (split + higher-order array functions, " +
        "no explode): at 100 TB the whole suite is a projection on the " +
        "corpus scan, zero shuffles. Every signal is an int count or " +
        "int/int division, so the DuckDB gate hashes the signals " +
        "themselves. On THIS synthetic corpus the full keep is " +
        "uniformly false — the fixture vocabulary contains only 1 of " +
        "the 8 required function words (real web text trivially " +
        "carries them) — so keep_no_stop additionally gates the " +
        "decision with the stop-word rule factored out, where the " +
        "word-count bound discriminates doc by doc.",
      (s, d) => {
        // ONE fused codegen'd pass (graft.functions.GopherSignals) over
        // the chunked text — the WebFilters Column formulation
        // re-derives the word/line arrays per signal (11 interpreted
        // HOF trees, each re-evaluating the chunkLines HOF child):
        // 21.3 s of the round-11 sf0.1 bench. GopherSignalsSpec asserts
        // bit-equality of every field against the Column formulation.
        val g = graft.functions.GopherSignals.all(chunkLines(col("text")))
        Tables.documents(s, d)
          .withColumn("__g", g)
          .select(
            col("doc_id"),
            col("__g.n_words").as("n_words"),
            col("__g.mean_word_len").as("mean_word_len"),
            col("__g.symbol_ratio").as("symbol_ratio"),
            col("__g.alpha_frac").as("alpha_frac"),
            col("__g.stop_hits").as("stop_hits"),
            col("__g.ellipsis_frac").as("ellipsis_frac"),
            col("__g.bullet_frac").as("bullet_frac"),
            col("__g.dup_line_frac").as("dup_line_frac"),
            col("__g.dup_char_frac").as("dup_char_frac"),
            col("__g.keep").as("keep"),
            col("__g.keep_no_stop").as("keep_no_stop")
          ).orderBy("doc_id")
      },
      gopherOracle),

    Q("ta_gopher_colform",
      "The identical Gopher rule suite stated as composable Column " +
        "expressions (WebFilters) - the reference formulation the " +
        "fused ta_gopher expression is spec'd bit-equal to, kept " +
        "oracle-gated so BOTH formulations stay correct. Runs on the " +
        "doc_id % 10 slice: signals are a pure per-document " +
        "projection, so the slice proves the formulation at a tenth " +
        "of the interpreted-HOF cost (the full-corpus proof is the " +
        "fused query plus GopherSignalsSpec's bit-equality).",
      (s, d) => {
        val t = chunkLines(col("text"))
        Tables.documents(s, d).filter(col("doc_id") % 10 === 0).select(
          col("doc_id"),
          WebFilters.nWords(t).as("n_words"),
          WebFilters.meanWordLen(t).as("mean_word_len"),
          WebFilters.symbolWordRatio(t).as("symbol_ratio"),
          WebFilters.alphaWordFrac(t).as("alpha_frac"),
          WebFilters.stopWordHits(t).as("stop_hits"),
          WebFilters.ellipsisLineFrac(t).as("ellipsis_frac"),
          WebFilters.bulletLineFrac(t).as("bullet_frac"),
          WebFilters.dupLineFrac(t).as("dup_line_frac"),
          WebFilters.dupLineCharFrac(t).as("dup_char_frac"),
          WebFilters.gopherKeep(t).as("keep"),
          WebFilters.gopherKeepNoStop(t).as("keep_no_stop")
        ).orderBy("doc_id")
      },
      gopherOracle("WHERE doc_id % 10 = 0")),

    Q("doc_token_budget",
      "The token-budget plan a data-mixing decision is made from: " +
        "mixtures are allocated in TOKENS, not documents (long-doc " +
        "sources eat budget faster than their doc share suggests). ONE " +
        "map-side-combined pass yields per-source doc and token " +
        "counts; totals are a 1-row broadcast; shares, the alpha-" +
        "tempered sampling rate (bit-identical to doc_mixture's — this " +
        "is that sampler's dry-run report) and the expected doc/token " +
        "draws are arithmetic on those integers. One exchange over " +
        "|sources| rows at any corpus size.",
      (s, d) => graft.ops.Curation.tokenBudget(
        Tables.documents(s, d), "source", "text",
        alpha = 0.5, targetFrac = 0.5).orderBy("source"),
      Some(
        s"""WITH tok AS (
           |  SELECT source,
           |    CASE WHEN trim(text) = '' THEN 0
           |         ELSE len(string_split_regex(trim(text), '\\s+')) END
           |      AS tk
           |  FROM documents),
           |mc AS (
           |  SELECT source, count(*) AS n, sum(tk)::BIGINT AS toks
           |  FROM tok GROUP BY source),
           |mt AS (
           |  SELECT cast(sum(n) AS DOUBLE) AS nn,
           |         cast(sum(toks) AS DOUBLE) AS tt,
           |         cast(sum(cast(sqrt(cast(n AS DOUBLE))
           |           AS DECIMAL(38,14))) AS DOUBLE) AS wsum
           |  FROM mc)
           |SELECT mc.source, mc.n AS n_docs, mc.toks AS n_tokens,
           |  cast(mc.n AS DOUBLE) / mt.nn AS doc_share,
           |  cast(mc.toks AS DOUBLE) / mt.tt AS token_share,
           |  least(1.0::DOUBLE,
           |    0.5 * mt.nn * sqrt(cast(mc.n AS DOUBLE)) / mt.wsum
           |      / cast(mc.n AS DOUBLE)) AS rate,
           |  least(1.0::DOUBLE,
           |    0.5 * mt.nn * sqrt(cast(mc.n AS DOUBLE)) / mt.wsum
           |      / cast(mc.n AS DOUBLE)) * cast(mc.n AS DOUBLE)
           |    AS exp_docs,
           |  least(1.0::DOUBLE,
           |    0.5 * mt.nn * sqrt(cast(mc.n AS DOUBLE)) / mt.wsum
           |      / cast(mc.n AS DOUBLE)) * cast(mc.toks AS DOUBLE)
           |    AS exp_tokens
           |FROM mc, mt
           |ORDER BY source""".stripMargin)),

    Q("ta_c4",
      "C4 line cleaning (Raffel et al. 2020 §2.2) as one scan " +
        "projection: keep lines that end in terminal punctuation AND " +
        "carry >= 5 words (order preserved), then the document rules " +
        "on the CLEANED text — >= 3 surviving lines, no 'lorem " +
        "ipsum', no '{'. Cleaning before counting is the paper's " +
        "order: a doc can fall below the line minimum only after its " +
        "boilerplate lines are gone.",
      (s, d) => {
        val cleaned = WebFilters.c4CleanLines(chunkLines(col("text")), 5)
        Tables.documents(s, d).select(
          col("doc_id"),
          cleaned.as("clean_text"),
          WebFilters.c4Keep(cleaned, 3).as("kept")
        ).orderBy("doc_id")
      },
      Some(
        s"""WITH $LinedCtes,
           |cleaned AS (
           |  SELECT doc_id,
           |    array_to_string(list_filter(ls,
           |      l -> regexp_matches(l, '[.!?"]$$') AND
           |           len(list_filter(string_split_regex(l, '\\s+'),
           |               x -> x <> '')) >= 5),
           |      chr(10)) AS clean_text
           |  FROM split)
           |SELECT doc_id, clean_text,
           |  (len(list_filter(list_transform(string_split(clean_text,
           |       chr(10)), l -> trim(l)), l -> l <> '')) >= 3 AND
           |   NOT contains(lower(clean_text), 'lorem ipsum') AND
           |   NOT contains(clean_text, '{')) AS kept
           |FROM cleaned
           |ORDER BY doc_id""".stripMargin))
  )
}
