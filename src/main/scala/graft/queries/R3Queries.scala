package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{Curation, Dedup, Inference, Layout, Multimodal, Similarity, TextOps}

/** Round-2 session additions: corpus-curation operators (PII redaction,
  * sequence packing, stratified sampling) and multimodal frame sampling —
  * the remaining training-data-pipeline surface on top of dedup/
  * similarity/text-analysis.
  */
object R3Queries {

  /** Synthesized PII column: the fixture text carries no emails/ids, so
    * the query plants deterministic ones (derived from doc_id) — the
    * redaction operator then has real matches to scrub, and the oracle
    * can plant the identical values.
    */
  private[queries] def piiText = concat(col("text"),
    lit(" contact user"), col("doc_id"), lit("@example.com ref "),
    (col("doc_id") * 1234567L + 8000000L).cast("string"),
    lit(" ssn 123-45-6789"))

  private[queries] val piiSql =
    "text || ' contact user' || doc_id || '@example.com ref ' || " +
      "(doc_id * 1234567 + 8000000) || ' ssn 123-45-6789'"

  // DuckDB restatements of Curation's Java-regex patterns (single-quoted,
  // so backslashes survive; RE2 and java.util.regex agree on these).
  private[queries] val emailSql = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[queries] val ssnSql = "\\b\\d{3}-\\d{2}-\\d{4}\\b"
  private[queries] val numSql = "\\b\\d{6,}\\b"

  /** DuckDB restatement of Dedup.dotExact over index i (1-based; local
    * copy of ExtQueries' helper to keep this file self-contained).
    */
  private def dotSql(a: String, b: String): String =
    s"cast(sum(cast($a[i]::DOUBLE * $b[i]::DOUBLE AS DECIMAL(38,14))) AS DOUBLE)"

  val all: Seq[Q] = Seq(

    Q("sim_quant",
      "Int8-quantized ANN with exact rescoring (the PQ-shaped 100TB " +
        "path: 4x smaller codes for scan + shortlist scoring): symmetric " +
        "per-vector quantization, approximate cosine entirely in integer " +
        "code space (scales cancel), top-50 shortlist, exact decimal " +
        "cosine on survivors only.",
      (s, d) => Similarity.quantTopK(Tables.embeddings(s, d),
        "vec_id", "embedding", queryId = 0L, k = 10, rescore = 50),
      Some(s"""WITH sc AS (
              |  SELECT vec_id,
              |    greatest(max(abs(embedding[i]::DOUBLE)), 1e-30) / 127 AS scale
              |  FROM embeddings, generate_series(1, 64) g(i) GROUP BY vec_id),
              |qv AS (
              |  SELECT e.vec_id, i,
              |    CAST(round(e.embedding[i]::DOUBLE / s.scale) AS BIGINT) AS q
              |  FROM embeddings e JOIN sc s USING (vec_id),
              |       generate_series(1, 64) g(i)),
              |qq AS (SELECT i, q FROM qv WHERE vec_id = 0),
              |qnn AS (SELECT CAST(sum(q * q) AS BIGINT) AS n FROM qq),
              |qd AS (
              |  SELECT a.vec_id, CAST(sum(a.q * b.q) AS BIGINT) AS dab,
              |         CAST(sum(a.q * a.q) AS BIGINT) AS daa
              |  FROM qv a JOIN qq b USING (i) GROUP BY a.vec_id),
              |short AS (
              |  SELECT vec_id,
              |    dab::DOUBLE / (sqrt(daa::DOUBLE) *
              |      sqrt((SELECT n FROM qnn)::DOUBLE)) AS approx_sim
              |  FROM qd WHERE daa > 0
              |  ORDER BY approx_sim DESC, vec_id LIMIT 50),
              |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
              |nq AS (
              |  SELECT sqrt(${dotSql("qe", "qe")}) AS nrm
              |  FROM q, generate_series(1, 64) g(i)),
              |m AS (
              |  SELECT e.vec_id, e.embedding FROM embeddings e
              |  JOIN short s ON e.vec_id = s.vec_id),
              |ne AS (
              |  SELECT vec_id, sqrt(${dotSql("embedding", "embedding")}) AS nrm
              |  FROM m, generate_series(1, 64) g(i) GROUP BY vec_id),
              |dots AS (
              |  SELECT m.vec_id, ${dotSql("m.embedding", "q.qe")} AS dot
              |  FROM m, q, generate_series(1, 64) g(i) GROUP BY m.vec_id)
              |SELECT d.vec_id, s.approx_sim, d.dot / (ne.nrm * nq.nrm) AS cos_sim
              |FROM dots d JOIN ne ON d.vec_id = ne.vec_id
              |  JOIN short s ON d.vec_id = s.vec_id, nq
              |ORDER BY cos_sim DESC, d.vec_id LIMIT 10""".stripMargin)),

    Q("dedup_incremental",
      "Incremental dedup against a historical corpus: a Bloom filter " +
        "over history's fingerprints (distributed agg, fixed-size, " +
        "broadcast) lets BF-negative incoming rows skip the anti-join " +
        "entirely — no false negatives means the result is EXACT while " +
        "the join input shrinks to ~dup_rate+fpp of incoming. Oracle: " +
        "the plain anti-join.",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .withColumn("fp", TextOps.fingerprint(col("text")))
        Dedup.newAgainstHistory(
            docs.filter(col("doc_id") % 3 =!= 0),
            docs.filter(col("doc_id") % 3 === 0),
            "fp", expectedItems = 100000L)
          .select("doc_id", "fp")
          .orderBy("doc_id")
      },
      // history = doc_id % 3 = 0 side; incoming = the rest (matching the
      // Spark arguments above: incoming first, history second)
      Some("""WITH f AS (
             |  SELECT doc_id,
             |    md5(trim(regexp_replace(regexp_replace(lower(text),
             |      '[\x00-\x1f]+', ' ', 'g'), '\s+', ' ', 'g'))) AS fp
             |  FROM documents)
             |SELECT i.doc_id, i.fp
             |FROM f i
             |WHERE i.doc_id % 3 <> 0
             |  AND NOT EXISTS (SELECT 1 FROM f h
             |                  WHERE h.doc_id % 3 = 0 AND h.fp = i.fp)
             |ORDER BY i.doc_id""".stripMargin)),

    Q("q27_range_frame",
      "RANGE-frame window: per-customer 30-day trailing order total — " +
        "the frame is bounded by VALUE distance (order date in days), " +
        "not row count, so bursts of same-day orders aggregate together. " +
        "The other WindowExec frame shape next to q22's ROWS/default " +
        "frames.",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val day = (unix_micros(col("o_orderdate").cast("timestamp")) /
          86400000000L).cast("long")
        val w = Window.partitionBy("o_custkey").orderBy("order_day")
          .rangeBetween(-30, Window.currentRow)
        Tables.orders(s, d)
          .filter(col("o_custkey") % 20 === 0)
          .withColumn("order_day", day)
          .select(col("o_custkey"), col("o_orderkey"), col("order_day"),
            // .over must attach to the aggregate itself; cast outside
            sum(col("o_totalprice")
                .cast(org.apache.spark.sql.types.DecimalType(28, 8)))
              .over(w).cast("double").as("trailing_30d"),
            count(lit(1)).over(w).as("n_trailing"))
          .orderBy("o_custkey", "order_day", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  epoch_us(o_orderdate) // 86400000000 AS order_day,
             |  cast(sum(cast(o_totalprice AS DECIMAL(28,8)))
             |    OVER w AS DOUBLE) AS trailing_30d,
             |  count(*) OVER w AS n_trailing
             |FROM orders
             |WHERE o_custkey % 20 = 0
             |WINDOW w AS (PARTITION BY o_custkey
             |  ORDER BY epoch_us(o_orderdate) // 86400000000
             |  RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
             |ORDER BY o_custkey, order_day, o_orderkey""".stripMargin)),

    Q("q26_multi_distinct",
      "Several COUNT(DISTINCT) over different columns in one aggregation " +
        "— Catalyst plans this through Expand (rows replicated per " +
        "distinct set, then one partial-aggregable pass) instead of N " +
        "self-joined subqueries.",
      (s, d) => Tables.orders(s, d)
        .groupBy("o_orderstatus")
        .agg(countDistinct(col("o_custkey")).as("n_cust"),
          countDistinct(col("o_orderpriority")).as("n_prio"),
          count(lit(1)).as("n"))
        .orderBy("o_orderstatus"),
      Some("""SELECT o_orderstatus,
             |  count(DISTINCT o_custkey) AS n_cust,
             |  count(DISTINCT o_orderpriority) AS n_prio,
             |  count(*) AS n
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("dedup_editdist",
      "Edit-distance verification of MinHash candidates: the LSH banding " +
        "produces the candidate pairs (never a cross join), then exact " +
        "Levenshtein distance — identical integer DP in any engine — " +
        "scores each survivor. The fuzzy-verify alternative to Jaccard " +
        "when character-level edits (OCR noise, typos) are the dup " +
        "mechanism; the O(len²) DP runs only on candidates.",
      (s, d) => {
        val docs = Tables.documents(s, d)
        Dedup.minhashCandidates(docs, "doc_id", "text",
            Dedup.Shingler.words(5), bandsN = 2, rowsPerBand = 3)
          .join(docs.select(col("doc_id").as("id_a"), col("text").as("ta")), "id_a")
          .join(docs.select(col("doc_id").as("id_b"), col("text").as("tb")), "id_b")
          .select(col("id_a"), col("id_b"),
            levenshtein(col("ta"), col("tb")).cast("long").as("edit_dist"))
          .orderBy("id_a", "id_b")
      },
      Some(s"""WITH ${ExtQueries.minhashPairCtes},
              |p2 AS (SELECT id_a, id_b FROM pairs GROUP BY 1, 2)
              |SELECT p.id_a, p.id_b,
              |  CAST(levenshtein(da.text, db.text) AS BIGINT) AS edit_dist
              |FROM p2 p
              |  JOIN documents da ON da.doc_id = p.id_a
              |  JOIN documents db ON db.doc_id = p.id_b
              |ORDER BY p.id_a, p.id_b""".stripMargin)),

    Q("dq_profile",
      "Data profiling in ONE pass: every column's non-null count, " +
        "distinct count and min/max from a single aggregation (multi-" +
        "countDistinct plans through Expand), exploded to a per-column " +
        "report — the before/after quality gate of a curation pipeline. " +
        "Never N per-column scans.",
      (s, d) => graft.ops.Profile.table(Tables.lineitem(s, d),
          Seq("l_orderkey", "l_partkey", "l_linenumber",
            "l_returnflag", "l_linestatus"))
        .orderBy("col_name"),
      Some(Seq("l_orderkey", "l_partkey", "l_linenumber",
          "l_returnflag", "l_linestatus")
        .map(c =>
          s"""SELECT '$c' AS col_name, count($c) AS n_nonnull,
             |  count(DISTINCT $c) AS n_distinct,
             |  min($c)::VARCHAR AS min_s, max($c)::VARCHAR AS max_s,
             |  count(*) AS n_rows FROM lineitem""".stripMargin)
        .mkString("", "\nUNION ALL\n", "\nORDER BY col_name"))),

    Q("dx_embed",
      "Embedding inference as an operator: text → 8-dim vector via the " +
        "executor-cached, micro-batched mapPartitions seam (stand-in " +
        "embedder = md5 bytes mapped to [-1,1]; a real one wraps a " +
        "sentence-transformer). The stage that produces the embedding " +
        "column the ANN/near-dup suite consumes. Dims exploded to " +
        "columns for the oracle compare.",
      (s, d) => {
        val emb = Inference.embed(
          Tables.documents(s, d).select(col("doc_id"), col("text")), "text")
        emb.select(col("doc_id") +:
            (0 until 8).map(j => col("embedding")(j).as(s"e$j")): _*)
          .orderBy("doc_id")
      },
      Some(("SELECT doc_id" +
        (0 until 8).map(j =>
          s",\n  (('0x' || substring(md5(text), ${2 * j + 1}, 2))::INT / 255.0)" +
            s" * 2 - 1 AS e$j").mkString +
        "\nFROM documents ORDER BY doc_id"))),

    Q("ta_redact",
      "PII redaction over documents: email / SSN-shaped / long-number " +
        "patterns replaced in a fixed pass order, per-pattern match " +
        "counts taken against the original text. Pure codegen'd " +
        "regexp_replace chain — no UDF, no shuffle; runs inside the " +
        "scan's project stage at any scale.",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"), piiText.as("t"))
        .select(col("doc_id"),
          Curation.redact(col("t")).as("redacted"),
          Curation.matchCount(col("t"), Curation.EmailRe).as("n_emails"),
          Curation.matchCount(col("t"), Curation.SsnRe).as("n_ssn"),
          Curation.matchCount(col("t"), Curation.LongNumberRe).as("n_ids"))
        .orderBy("doc_id"),
      Some(s"""WITH p AS (SELECT doc_id, $piiSql AS t FROM documents)
              |SELECT doc_id,
              |  regexp_replace(regexp_replace(regexp_replace(t,
              |    '$emailSql', '<EMAIL>', 'g'),
              |    '$ssnSql', '<SSN>', 'g'),
              |    '$numSql', '<ID>', 'g') AS redacted,
              |  len(regexp_extract_all(t, '$emailSql')) AS n_emails,
              |  len(regexp_extract_all(t, '$ssnSql')) AS n_ssn,
              |  len(regexp_extract_all(t, '$numSql')) AS n_ids
              |FROM p ORDER BY doc_id""".stripMargin)),

    Q("ta_pack",
      "Sequence packing (concat-and-chop): each source shard's documents " +
        "are assigned, in doc_id order, to fixed-256-token training " +
        "sequences via one per-shard window cumsum — never a global " +
        "order-by, so shards pack in parallel at any scale. Output is " +
        "one row per packed sequence.",
      (s, d) => Curation
        .packSequences(Tables.documents(s, d), "source", "doc_id", "text", 256)
        .groupBy(col("source"), col("seq_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum("n_tokens").as("seq_tokens"),
          min("doc_id").as("first_doc"))
        .orderBy("source", "seq_id"),
      Some("""WITH t AS (
             |  SELECT doc_id, source,
             |    CASE WHEN trim(text) = '' THEN 0
             |         ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens
             |  FROM documents),
             |c AS (
             |  SELECT *, sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
             |    ROWS UNBOUNDED PRECEDING) - n_tokens AS tok_before
             |  FROM t)
             |SELECT source, CAST(floor(tok_before / 256) AS BIGINT) AS seq_id,
             |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS seq_tokens,
             |  min(doc_id) AS first_doc
             |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    Q("doc_sample",
      "Deterministic stratified sampling: keep a document when the first " +
        "4 hex digits of md5(doc_id) fall under its language's rate " +
        "(en 50%, zh 20%, others 10%). Hash-threshold sampling is " +
        "reproducible across runs and engines, needs no RNG state, and " +
        "plans as a plain pushed-down filter — the lake-scale " +
        "alternative to sample()'s per-partition RNG.",
      (s, d) => Curation.stratifiedSample(Tables.documents(s, d),
          "lang", "doc_id", Map("en" -> 0.5, "zh" -> 0.2), defaultRate = 0.1)
        .select("doc_id", "lang", "source")
        .orderBy("doc_id"),
      Some("""SELECT doc_id, lang, source FROM documents
             |WHERE ('0x' || substring(md5(doc_id::VARCHAR), 1, 4))::BIGINT
             |  < (CASE lang WHEN 'en' THEN 0.5 WHEN 'zh' THEN 0.2
             |     ELSE 0.1 END) * 65536
             |ORDER BY doc_id""".stripMargin)),

    Q("mm_resize",
      "Multimodal resize with a REAL codec roundtrip: genuine solid-gray " +
        "PNG per doc_id → javax.imageio decode → Graphics2D bilinear " +
        "rescale to 16×16 → PNG re-encode → decode AGAIN for the reported " +
        "metadata. Bilinear over a constant image is that constant, so " +
        "DuckDB predicts the resized pixel md5 as md5(repeat(chr(gray), " +
        "256)) — the codec work is real, the expectation is constructed. " +
        "The codec stage reads byte-budget partitions " +
        "(Layout.repartitionByBytes), not row-count partitions, so " +
        "variable-size payloads can't produce straggler decode tasks.",
      (s, d) => Multimodal.resize(
          Layout.repartitionByBytes(
            Multimodal.imageFixture(
              Tables.documents(s, d).select(col("doc_id")), "doc_id"),
            "payload", targetBytes = 64L << 20),
          "payload", width = 16, height = 16)
        .select(col("doc_id"),
          col("resized_meta.width"), col("resized_meta.height"),
          col("resized_meta.format"), col("resized_meta.pixel_md5"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  CAST(16 AS BIGINT) AS width, CAST(16 AS BIGINT) AS height,
             |  'png' AS format,
             |  md5(repeat(chr(CAST(32 + doc_id % 64 AS INT)), 256)) AS pixel_md5
             |FROM documents
             |ORDER BY doc_id""".stripMargin)),

    Q("mm_frames",
      "Multimodal frame sampling with a REAL multi-frame decoder: each " +
        "doc_id becomes a genuine animated GIF (2-5 solid frames, fills " +
        "a pure function of (id, frame)), then javax.imageio's GIF " +
        "reader walks the sequence and every 2nd frame emits its DECODED " +
        "dimensions and an md5 over getRGB bytes — representation-proof " +
        "(palette-indexed and truecolor decodes hash identically), so " +
        "DuckDB predicts every frame as md5(repeat(chr(g), w*h*3)). " +
        "Frames decode over byte-budget partitions " +
        "(Layout.repartitionByBytes) — per-task codec work tracks bytes, " +
        "not row count.",
      (s, d) => Multimodal.sampleImageFrames(
          Layout.repartitionByBytes(
            Multimodal.gifFixture(
              Tables.documents(s, d).select(col("doc_id")), "doc_id"),
            "payload", targetBytes = 64L << 20),
          "doc_id", "payload", stride = 2)
        .orderBy("doc_id", "frame_no"),
      Some("""WITH f AS (
             |  SELECT doc_id,
             |    unnest(generate_series(0, CAST(2 + doc_id % 4 AS INT) - 1)) AS i
             |  FROM documents)
             |SELECT doc_id, CAST(i AS BIGINT) AS frame_no,
             |  CAST(8 AS BIGINT) AS width, CAST(6 AS BIGINT) AS height,
             |  md5(repeat(chr(CAST(32 + (doc_id * 7 + i * 11) % 64 AS INT)),
             |      8 * 6 * 3)) AS rgb_md5
             |FROM f WHERE i % 2 = 0
             |ORDER BY doc_id, frame_no""".stripMargin)))
}
