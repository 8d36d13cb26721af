package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.{Dedup, Truncate}

/** Round-3 session queries. */
object R4Queries {

  /** The WordPiece fixture vocab as a DuckDB VALUES literal — generated
    * from the same Scala constant the Spark expression uses, so vocab and
    * oracle can never drift.
    */
  private val wordPieceVocabValues: String =
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
