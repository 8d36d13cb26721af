package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.Normalize
import graft.ops.{Similarity, Truncate}

/** Round-9 session-3, batch 3: PCA top component (hash-gated power
  * iteration), Unicode NFC normalization as a codegen'd expression,
  * tokenizer fertility per language, and streaming count-min
  * maintenance.
  */
object R17Queries {

  private val PcaDims = 64
  private val PcaIters = 8

  /** Unrolled power-iteration CTEs: w = C·v (decimal-staged matvec),
    * n = ||w||, v = w/n — the exact arithmetic
    * [[Similarity.pcaTopComponent]]'s driver loop replays.
    */
  private def pcaIterCtes: String =
    (1 to PcaIters).map { k =>
      s"""w$k AS MATERIALIZED (
         |  SELECT c.i,
         |    list_reduce(list(c.c * v.x ORDER BY c.j),
         |      (a, b) -> a + b) AS w
         |  FROM covf c JOIN v${k - 1} v ON v.i = c.j
         |  GROUP BY c.i),
         |n$k AS MATERIALIZED (
         |  SELECT sqrt(list_reduce(list(w * w ORDER BY i),
         |    (a, b) -> a + b)) AS nn
         |  FROM w$k),
         |v$k AS MATERIALIZED (SELECT i, w / nn AS x FROM w$k, n$k)""".stripMargin
    }.mkString(",\n")

  val all: Seq[Q] = Seq(

    Q("sim_pca",
      "PCA top component of the embedding cloud by power iteration — " +
        "the whitening/dimension-reduction measurement (a dominant " +
        "axis carrying most of the variance is the 'common direction' " +
        "pathology that hurts cosine retrieval, and what Matryoshka " +
        "truncation silently depends on). Scale split: the ONLY " +
        "corpus-sized work is ONE moment pass — each row explodes to " +
        "its 2080 upper-triangle products + 64 values + a count " +
        "marker, map-side-combined into 2145 exact DECIMAL(38,14) " +
        "cells; the 64×64 eigensolve is then driver-bounded math " +
        "whose every sum stages through scale-14 decimals, so all 8 " +
        "power-iteration rounds, the eigenvalue, and the explained " +
        "fraction are BIT-IDENTICAL to the oracle's unrolled CTE " +
        "replay — a fully hash-gated eigensolve.",
      (s, d) => Similarity.pcaTopComponent(Tables.embeddings(s, d),
        "embedding", dims = PcaDims, iters = PcaIters),
      Some(s"""WITH e AS MATERIALIZED (SELECT embedding AS v FROM embeddings),
              |nn0 AS (SELECT count(*) AS n FROM e),
              |mu AS MATERIALIZED (
              |  SELECT i,
              |    cast(sum(cast(v[i]::DOUBLE * 1125899906842624.0
              |        AS DECIMAL(38,0))) AS DOUBLE)
              |      / n / 1125899906842624.0 AS mu
              |  FROM e, nn0, generate_series(1, $PcaDims) g(i)
              |  GROUP BY i, n),
              |s2 AS MATERIALIZED (
              |  SELECT gi.i, gj.j,
              |    cast(sum(
              |      cast(v[gi.i]::DOUBLE * 1125899906842624.0
              |        AS DECIMAL(19,0)) *
              |      cast(v[gj.j]::DOUBLE * 1125899906842624.0
              |        AS DECIMAL(19,0))) AS DOUBLE) AS sxy
              |  FROM e, generate_series(1, $PcaDims) gi(i),
              |       generate_series(1, $PcaDims) gj(j)
              |  WHERE gj.j >= gi.i
              |  GROUP BY gi.i, gj.j),
              |cov AS MATERIALIZED (
              |  SELECT s2.i, s2.j,
              |    sxy / n / 1267650600228229401496703205376.0
              |      - (mi.mu * mj.mu) AS c
              |  FROM s2, nn0
              |  JOIN mu mi ON mi.i = s2.i
              |  JOIN mu mj ON mj.i = s2.j),
              |covf AS MATERIALIZED (
              |  SELECT i, j, c FROM cov
              |  UNION ALL SELECT j AS i, i AS j, c FROM cov WHERE i <> j),
              |v0 AS MATERIALIZED (SELECT i, 1.0::DOUBLE AS x
              |       FROM generate_series(1, $PcaDims) g(i)),
              |$pcaIterCtes,
              |cvf AS (
              |  SELECT c.i,
              |    list_reduce(list(c.c * v.x ORDER BY c.j),
              |      (a, b) -> a + b) AS w
              |  FROM covf c JOIN v$PcaIters v ON v.i = c.j
              |  GROUP BY c.i),
              |lam AS (
              |  SELECT list_reduce(list(cv.w * v.x ORDER BY i),
              |    (a, b) -> a + b) AS l
              |  FROM cvf cv JOIN v$PcaIters v USING (i)),
              |tr AS (SELECT list_reduce(list(c ORDER BY i),
              |         (a, b) -> a + b) AS t
              |       FROM cov WHERE i = j)
              |SELECT CAST(mu.i AS BIGINT) AS dim, mu.mu AS mean,
              |  dg.c AS variance, vf.x AS pc1, lam.l AS eigenvalue,
              |  lam.l / tr.t AS explained_frac
              |FROM mu
              |JOIN (SELECT i, c FROM cov WHERE i = j) dg ON dg.i = mu.i
              |JOIN v$PcaIters vf ON vf.i = mu.i, lam, tr
              |ORDER BY dim""".stripMargin)),

    Q("ta_nfc",
      "Unicode NFC canonicalization as a NATIVE codegen'd Catalyst " +
        "expression (functions.UnicodeNormalize — java.text.Normalizer " +
        "inside WholeStageCodegen, never a UDF): composed and " +
        "decomposed spellings of the same text are byte-different, so " +
        "every hash-keyed dedup silently misses them until this runs. " +
        "The fixture corpus is pure ASCII, so the query PREPENDS a " +
        "decomposed prefix ('Cafe'+U+0301, 'No'+U+0308+'el') to every " +
        "row — raw length counts the combining marks, NFC length " +
        "composes them away, and the md5 of the normalized text " +
        "hash-checks Spark's Normalizer against DuckDB's " +
        "nfc_normalize codepoint-for-codepoint. Pure scan expression; " +
        "NFKC (ligature/width folding, no DuckDB counterpart) is " +
        "spec-pinned in NormalizeSpec.",
      (s, d) => {
        val t = concat(lit("Cafe\u0301 No\u0308el "), col("text"))
        Tables.documents(s, d).select(col("doc_id"),
            length(t).cast("long").as("raw_len"),
            length(Normalize.nfc(t)).cast("long").as("nfc_len"),
            md5(Normalize.nfc(t).cast("binary")).as("nfc_md5"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  length('Cafe\u0301 No\u0308el ' || text) AS raw_len,
             |  length(nfc_normalize('Cafe\u0301 No\u0308el ' || text))
             |    AS nfc_len,
             |  md5(nfc_normalize('Cafe\u0301 No\u0308el ' || text))
             |    AS nfc_md5
             |FROM documents
             |ORDER BY doc_id""".stripMargin)),

    Q("ta_fertility",
      "Tokenizer FERTILITY per language — subword pieces per word, the " +
        "standard tokenizer-fit metric (a fertility far above ~1.3 " +
        "means the vocab fragments that language's words into letter " +
        "soup, inflating sequence lengths and training cost): corpus " +
        "words and WordPiece pieces (the codegen'd max-munch " +
        "expression of ta_subword) summed per lang in ONE scan-stage " +
        "aggregate. The oracle replays the greedy walk in SQL and " +
        "re-aggregates — every piece boundary in the corpus backs the " +
        "three totals.",
      (s, d) => {
        val norm = graft.functions.WordPiece.normalize(col("text"))
        val words = when(norm === "", lit(0L))
          .otherwise(size(split(norm, " ")).cast("long"))
        Tables.documents(s, d)
          .select(col("lang"), words.as("__w"),
            Truncate.subwordCount(col("text")).cast("long").as("__p"))
          .groupBy(col("lang"))
          .agg(sum(col("__w")).as("n_words"), sum(col("__p")).as("n_pieces"),
            (sum(col("__p")).cast("double") / sum(col("__w")).cast("double"))
              .as("fertility"))
          .orderBy("lang")
      },
      Some(
        s"""WITH RECURSIVE vocab(piece) AS (VALUES ${R4Queries.wordPieceVocabValues}),
           |vocab2 AS (
           |  SELECT CASE WHEN piece LIKE '##%' THEN substring(piece, 3)
           |              ELSE piece END AS body,
           |         piece LIKE '##%' AS is_cont
           |  FROM vocab),
           |docs AS (
           |  SELECT doc_id,
           |    trim(regexp_replace(lower(regexp_replace(text, '[^\\x20-\\x7e]', '', 'g')),
           |         '[^a-z]+', ' ', 'g')) AS t
           |  FROM documents),
           |w0 AS (SELECT doc_id, string_split(t, ' ') AS sp FROM docs WHERE t <> ''),
           |w1 AS (SELECT doc_id, unnest(generate_series(1, len(sp))) AS wi, sp FROM w0),
           |words AS (SELECT doc_id, wi, sp[wi] AS word FROM w1),
           |pos AS (
           |  SELECT doc_id, wi, word, unnest(generate_series(1, len(word))) AS p
           |  FROM words),
           |steps AS (
           |  SELECT po.doc_id, po.wi, po.p, max(len(v.body)) AS step
           |  FROM pos po JOIN vocab2 v
           |    ON substring(po.word, po.p, 1) = substring(v.body, 1, 1)
           |   AND (po.p = 1) = (NOT v.is_cont)
           |   AND substring(po.word, po.p, len(v.body)) = v.body
           |  GROUP BY 1, 2, 3),
           |walk AS (
           |  SELECT doc_id, wi, word, 1 AS p, 0 AS k FROM words
           |  UNION ALL
           |  SELECT w.doc_id, w.wi, w.word, w.p + s.step, w.k + 1
           |  FROM walk w JOIN steps s
           |    ON s.doc_id = w.doc_id AND s.wi = w.wi AND s.p = w.p
           |  WHERE w.p <= len(w.word)),
           |done AS (SELECT doc_id, wi, k FROM walk WHERE p = len(word) + 1),
           |perdoc AS (
           |  SELECT doc_id, CAST(sum(k) AS BIGINT) AS pieces,
           |    count(*) AS words
           |  FROM done GROUP BY doc_id)
           |SELECT d.lang,
           |  CAST(sum(coalesce(p.words, 0)) AS BIGINT) AS n_words,
           |  CAST(sum(coalesce(p.pieces, 0)) AS BIGINT) AS n_pieces,
           |  CAST(sum(coalesce(p.pieces, 0)) AS DOUBLE) /
           |    CAST(sum(coalesce(p.words, 0)) AS DOUBLE) AS fertility
           |FROM documents d LEFT JOIN perdoc p USING (doc_id)
           |GROUP BY d.lang
           |ORDER BY d.lang""".stripMargin)),

    Q("stream_cms",
      "Streaming count-min maintenance: batch 0 seeds the sketch with " +
        "the even-id half's cell partials, the stream appends the odd " +
        "half's partials under the commit-marker state machine, and " +
        "serving sums committed cells — CMS cells are algebraic, so " +
        "the served sketch is BIT-IDENTICAL to a full-corpus rebuild, " +
        "which is exactly what the oracle computes (the ta_cms counter " +
        "CTE over all documents). Per-batch cost is one explode×4 " +
        "aggregate over the batch; history is never rescanned.",
      (s, d) => {
        val path = sys.props.getOrElse("java.io.tmpdir", "/tmp") +
          "/graft_stream_cms_" + d.replaceAll("[^A-Za-z0-9.]", "_")
        graft.streaming.EventStream.runCmsStream(s, d, path)
        graft.streaming.EventStream.serveCmsStream(s, path)
          .orderBy("j", "bucket")
      },
      Some("""WITH toks AS (
             |  SELECT t.tok AS token
             |  FROM documents d,
             |       unnest(string_split_regex(trim(d.text), '\s+')) AS t(tok)
             |  WHERE t.tok <> '')
             |SELECT j, ('0x' || substring(md5(j::VARCHAR || ':' || token),
             |    1, 8))::BIGINT % 512 AS bucket, count(*) AS cnt
             |FROM toks, generate_series(0, 3) g(j)
             |GROUP BY 1, 2
             |ORDER BY j, bucket""".stripMargin)))
}
