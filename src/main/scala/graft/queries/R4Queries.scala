package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.{Curation, Dedup, TextAnalysis, Truncate}

/** Round-3 session queries. */
object R4Queries {

  /** The WordPiece fixture vocab as a DuckDB VALUES literal — generated
    * from the same Scala constant the Spark expression uses, so vocab and
    * oracle can never drift.
    */
  private[queries] val wordPieceVocabValues: String =
    graft.functions.WordPiece.FixtureVocab.map(p => s"('$p')").mkString(", ")

  val all: Seq[Q] = Seq(

    Q("ta_subword",
      "Subword tokenization with the pure-JVM greedy WordPiece expression " +
        "(codegen'd Catalyst Expression, fixture vocab): per-doc subword " +
        "count plus the first/last-12-piece T5 truncation branches. The " +
        "oracle replays the EXACT max-munch walk in SQL — a longest-" +
        "match-per-position table (vocab join + argmax, no recursion) " +
        "feeding a recursive walk that concatenates the chosen pieces — " +
        "so every `##` piece boundary is cross-checked in DuckDB.",
      (s, d) => Tables.documents(s, d).select(
          col("doc_id"),
          Truncate.subwordCount(col("text")).cast("long").as("n_subword"),
          Truncate.truncateSubword(col("text"), lit("gross_or_micro"), 12)
            .as("head_pieces"),
          Truncate.truncateSubword(col("text"), lit("entire report"), 12)
            .as("tail_pieces"))
        .orderBy("doc_id"),
      Some(
        s"""WITH RECURSIVE vocab(piece) AS (VALUES $wordPieceVocabValues),
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
           |  SELECT doc_id, wi, word, 1 AS p, 0 AS k, CAST('' AS VARCHAR) AS pieces
           |  FROM words
           |  UNION ALL
           |  SELECT w.doc_id, w.wi, w.word, w.p + s.step, w.k + 1,
           |    w.pieces || CASE WHEN w.p = 1 THEN '' ELSE ' ' END ||
           |      CASE WHEN w.p = 1 THEN substring(w.word, w.p, s.step)
           |           ELSE '##' || substring(w.word, w.p, s.step) END
           |  FROM walk w JOIN steps s
           |    ON s.doc_id = w.doc_id AND s.wi = w.wi AND s.p = w.p
           |  WHERE w.p <= len(w.word)),
           |done AS (SELECT doc_id, wi, k, pieces FROM walk WHERE p = len(word) + 1),
           |agg AS (
           |  SELECT doc_id, CAST(sum(k) AS BIGINT) AS n_subword,
           |    string_agg(pieces, ' ' ORDER BY wi) AS allp
           |  FROM done GROUP BY doc_id),
           |sliced AS (
           |  SELECT doc_id, n_subword, string_split(allp, ' ') AS pl FROM agg)
           |SELECT d.doc_id,
           |  coalesce(s.n_subword, 0) AS n_subword,
           |  coalesce(CASE WHEN s.n_subword <= 12 THEN array_to_string(s.pl, ' ')
           |                ELSE array_to_string(list_slice(s.pl, 1, 12), ' ') END,
           |           '') AS head_pieces,
           |  coalesce(CASE WHEN s.n_subword <= 12 THEN array_to_string(s.pl, ' ')
           |                ELSE array_to_string(list_slice(s.pl, -12, -1), ' ') END,
           |           '') AS tail_pieces
           |FROM documents d LEFT JOIN sliced s USING (doc_id)
           |ORDER BY doc_id""".stripMargin)),

    Q("curation_pipeline",
      "The LLM-curation flagship — redact → quality-gate (≥0.5) → exact " +
        "dedup (min-id survivor per md5 of redacted text) → per-source " +
        "sequence packing, composed as ONE lazy Catalyst plan the way " +
        "dx_pipeline composes the reference DAG: the scan-stage " +
        "projections fuse, the only exchanges are the dedup key shuffle " +
        "and the per-shard packing window. Oracle replays the whole " +
        "chain in a single DuckDB WITH pipeline.",
      (s, d) => {
        val red = Tables.documents(s, d)
          .select(col("doc_id"), col("source"),
            Curation.redact(col("text")).as("t"))
        val gated = red.filter(TextAnalysis.qualityScore(col("t")) >= 0.5)
        val ded = Dedup.exactDedup(gated, col("doc_id"), md5(col("t")))
        Curation.packSequences(ded, "source", "doc_id", "t", 256)
          .groupBy(col("source"), col("seq_id"))
          .agg(count(lit(1)).as("n_docs"),
            sum("n_tokens").as("seq_tokens"),
            min("doc_id").as("first_doc"))
          .orderBy("source", "seq_id")
      },
      Some(
        s"""WITH red AS (
           |  SELECT doc_id, source,
           |    regexp_replace(regexp_replace(regexp_replace(text,
           |      '${Curation.EmailRe}', '<EMAIL>', 'g'),
           |      '${Curation.SsnRe}', '<SSN>', 'g'),
           |      '${Curation.LongNumberRe}', '<ID>', 'g') AS t
           |  FROM documents),
           |feat AS (
           |  SELECT doc_id, source, t, length(t) AS n_chars,
           |    CASE WHEN trim(t) = '' THEN 0
           |         ELSE len(string_split_regex(trim(t), '\\s+')) END AS n_tokens,
           |    CASE WHEN length(t) = 0 THEN 0.0::DOUBLE
           |         ELSE length(regexp_replace(t, '[A-Za-z0-9\\s]', '', 'g')) / length(t) END AS punct_ratio,
           |    ((length(t) - length(replace(t, ' the ', ''))) / 5::DOUBLE
           |      + (length(t) - length(replace(t, ' a ', ''))) / 3::DOUBLE) AS stop_hits
           |  FROM red),
           |q AS (
           |  SELECT doc_id, source, t, n_tokens,
           |    least(n_chars / 500.0::DOUBLE, 1.0::DOUBLE) * 0.4::DOUBLE
           |      + (1.0::DOUBLE - punct_ratio) * 0.3::DOUBLE
           |      + least((CASE WHEN n_tokens = 0 THEN 0.0::DOUBLE
           |               ELSE stop_hits / n_tokens END) * 4.0::DOUBLE,
           |              1.0::DOUBLE) * 0.3::DOUBLE AS quality
           |  FROM feat),
           |ded AS (
           |  SELECT doc_id, source, n_tokens FROM q
           |  WHERE quality >= 0.5
           |  QUALIFY row_number() OVER (PARTITION BY md5(t) ORDER BY doc_id) = 1),
           |c AS (
           |  SELECT *, sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
           |    ROWS UNBOUNDED PRECEDING) - n_tokens AS tok_before
           |  FROM ded)
           |SELECT source, CAST(floor(tok_before / 256) AS BIGINT) AS seq_id,
           |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS seq_tokens,
           |  min(doc_id) AS first_doc
           |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    Q("dedup_cluster_star",
      "The dedup endgame on the ADVERSARIAL-graph algorithm: the same " +
        "MinHash-LSH pairs → connected components, but via alternating " +
        "small-star/large-star edge rewriting (Kiveris et al.) instead of " +
        "label propagation — the state is the shrinking edge list, and " +
        "each round quadruples distance-to-min reach on chain graphs. " +
        "Same cluster/survivor output contract as dedup_cluster, same " +
        "recursive-CTE oracle: two independent algorithms, one answer.",
      (s, d) => {
        val pairs = Dedup.minhashCandidates(Tables.documents(s, d),
          "doc_id", "text", Dedup.Shingler.words(5), bandsN = 2, rowsPerBand = 3)
        val cc = Dedup.connectedComponentsStar(pairs, "id_a", "id_b")
        val w = Window.partitionBy("cluster")
        cc.select(col("id"), col("label").as("cluster"))
          .withColumn("cluster_size", count(lit(1)).over(w))
          .withColumn("is_survivor", col("id") === col("cluster"))
          .orderBy("id")
      },
      Some(
        s"""WITH RECURSIVE ${ExtQueries.minhashPairCtes},
           |edges AS (
           |  SELECT id_a AS src, id_b AS dst FROM pairs
           |  UNION SELECT id_b, id_a FROM pairs),
           |reach AS (
           |  SELECT src AS id, src AS lab FROM edges
           |  UNION
           |  SELECT e.dst AS id, r.lab FROM reach r JOIN edges e ON e.src = r.id),
           |cc AS (SELECT id, min(lab) AS cluster FROM reach GROUP BY id)
           |SELECT id, cluster,
           |       count(*) OVER (PARTITION BY cluster) AS cluster_size,
           |       id = cluster AS is_survivor
           |FROM cc ORDER BY id""".stripMargin)))
}
