package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{Cdc, Multimodal, Similarity}

/** Round-9 session-6, batch 3: integer-exact sparse cosine join, audio
  * silence-span structure, and the CDC snapshot diff audit.
  */
object R24Queries {

  /** DuckDB restatement of [[Similarity.wordNgrams]] (n = 2, WITH
    * multiplicity — no list_distinct, unlike the shingle CTEs).
    */
  private val bigramSql: String = {
    val w = "string_split_regex(trim(lower(text)), '\\s+')"
    s"list_transform(generate_series(1, greatest(len($w) - 1, 1)), " +
      s"i -> array_to_string(list_slice($w, i, i + 1), ' '))"
  }

  val all: Seq[Q] = Seq(

    Q("sim_sparse",
      "Sparse cosine similarity JOIN over integer word-bigram tf " +
        "vectors - the bag-of-words complement to the dense ANN " +
        "family: pairs with cos >= 1/2 decided EXACTLY by the " +
        "cross-multiplied integer comparison 4*dot^2 >= |a|^2*|b|^2 - " +
        "no sqrt, no doubles, no decimal-cast drift; every output " +
        "cell is an exact integer. Candidates from a df-capped " +
        "postings self-join (a stop-gram can never go quadratic), " +
        "then the dot rescored over ALL shared grams of each " +
        "candidate - the threshold decision itself is uncapped-exact.",
      (s, d) => Similarity.sparseCosinePairs(Tables.documents(s, d),
        "doc_id", Similarity.wordNgrams(col("text"), 2), maxDf = 50),
      Some(s"""WITH tok AS (
              |  SELECT doc_id, unnest($bigramSql) AS t FROM documents),
              |tf AS (
              |  SELECT doc_id, t, count(*) AS c FROM tok
              |  WHERE t <> '' GROUP BY doc_id, t),
              |dfq AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
              |rare AS (
              |  SELECT tf.doc_id, tf.t FROM tf JOIN dfq USING (t)
              |  WHERE df <= 50),
              |cand AS (
              |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
              |  FROM rare a JOIN rare b
              |    ON a.t = b.t AND a.doc_id < b.doc_id),
              |n2 AS (SELECT doc_id, CAST(sum(c * c) AS BIGINT) AS n2
              |       FROM tf GROUP BY doc_id),
              |dots AS (
              |  SELECT cand.id_a, cand.id_b,
              |    CAST(sum(ta.c * tb.c) AS BIGINT) AS dot
              |  FROM cand JOIN tf ta ON ta.doc_id = cand.id_a
              |       JOIN tf tb ON tb.doc_id = cand.id_b AND tb.t = ta.t
              |  GROUP BY cand.id_a, cand.id_b)
              |SELECT d.id_a, d.id_b, d.dot, a.n2 AS na2, b.n2 AS nb2
              |FROM dots d JOIN n2 a ON a.doc_id = d.id_a
              |     JOIN n2 b ON b.doc_id = d.id_b
              |WHERE 4 * (d.dot::HUGEINT * d.dot) >= a.n2::HUGEINT * b.n2
              |ORDER BY d.id_a, d.id_b""".stripMargin)),

    Q("mm_audio_silence",
      "Silence-span structure over the real-codec WAV fixture - the " +
        "audio pass a speech pipeline runs before chunking (cut at " +
        "silences, not mid-word): 40-sample frames from the decoded " +
        "PCM, a frame is silent when energy < 300000 * n_in_frame " +
        "(mean per-sample energy, cross-multiplied integers), runs " +
        "collapse via the gaps-and-islands trick (frame_no - " +
        "row_number constant per run). Per clip: frames, silent " +
        "frames, span count, longest span - all exact integers from " +
        "the decode.",
      (s, d) => Multimodal.silenceReport(
        Multimodal.audioFrameEnergy(
          Multimodal.wavFixture(
            Tables.documents(s, d).select(col("doc_id")), "doc_id"),
          "doc_id", "payload", frameSize = 40),
        "doc_id", threshold = 300000L),
      Some("""WITH s AS (
             |  SELECT d.doc_id, g.i,
             |    ((d.doc_id // 2) * 31 + g.i * 17) % 2001 - 1000
             |      + (d.doc_id % 2) *
             |        (CASE WHEN g.i // 8 = 7 THEN 25 ELSE 0 END) AS v
             |  FROM documents d, generate_series(0, 599) g(i)
             |  WHERE g.i < 400 + ((d.doc_id // 2) % 5) * 40),
             |fr AS (
             |  SELECT doc_id, i // 40 AS frame_no, count(*) AS n,
             |    sum(v * v) AS e
             |  FROM s GROUP BY doc_id, frame_no),
             |sil AS (
             |  SELECT doc_id, frame_no,
             |    CASE WHEN e < 300000 * n THEN 1 ELSE 0 END AS sl
             |  FROM fr),
             |isl AS (
             |  SELECT doc_id, frame_no,
             |    frame_no - row_number() OVER (PARTITION BY doc_id
             |      ORDER BY frame_no) AS grp
             |  FROM sil WHERE sl = 1),
             |spans AS (
             |  SELECT doc_id, grp, count(*) AS len FROM isl
             |  GROUP BY doc_id, grp),
             |agg AS (
             |  SELECT doc_id, count(*) AS n_spans,
             |    CAST(max(len) AS BIGINT) AS longest FROM spans
             |  GROUP BY doc_id)
             |SELECT sil.doc_id, count(*) AS n_frames,
             |  CAST(sum(sl) AS BIGINT) AS n_silent,
             |  COALESCE(any_value(a.n_spans), 0) AS n_spans,
             |  COALESCE(any_value(a.longest), 0) AS longest_span
             |FROM sil LEFT JOIN agg a ON a.doc_id = sil.doc_id
             |GROUP BY sil.doc_id ORDER BY sil.doc_id""".stripMargin)),

    Q("cdc_diff",
      "Snapshot DIFF between two committed versions of the upsert " +
        "store - the 'what did this MERGE actually do' audit: keys " +
        "added, removed, changed (any compared column distinct), " +
        "unchanged, from one key-co-partitioned full outer join + one " +
        "4-cell aggregate. Values compare natively (IS NOT DISTINCT " +
        "FROM), never as strings, so double columns diff numerically. " +
        "Version 1 is the customer base, version 2 the cdc_upsert " +
        "merge result, both under the commit-marker chain.",
      (s, d) => {
        val base = Tables.customer(s, d)
          .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        val merged = Cdc.upsertLatest(base, R11Queries.upsertChanges(base),
          Seq("c_custkey"), "seq", "op")
        val path = sys.props.getOrElse("java.io.tmpdir", "/tmp") +
          "/graft_cdc_diff_" + d.replaceAll("[^A-Za-z0-9.]", "_")
        Cdc.writeSnapshot(base, path, 1L)
        Cdc.writeSnapshot(merged, path, 2L)
        Cdc.snapshotDiff(s, path, 1L, 2L, Seq("c_custkey"),
          Seq("c_name", "c_acctbal"))
      },
      // null-safe join + literal presence markers, matching the Spark
      // side's contract exactly: a NULL key value MATCHES its
      // counterpart (IS NOT DISTINCT FROM), and side presence is a
      // marker column, never key IS NULL — a plain = join would count
      // a null-keyed row as added+removed while Spark counts a match
      Some(s"""WITH ${R11Queries.upsertCtes},
              |j AS (
              |  SELECT b.in_a AS ia, m.in_b AS ib,
              |    b.c_name AS na, m.c_name AS nb,
              |    b.c_acctbal AS ba, m.c_acctbal AS bb
              |  FROM (SELECT *, 1 AS in_a FROM base) b
              |  FULL OUTER JOIN (SELECT *, 1 AS in_b FROM merged) m
              |    ON b.c_custkey IS NOT DISTINCT FROM m.c_custkey)
              |SELECT
              |  CAST(sum(CASE WHEN ia IS NULL THEN 1 ELSE 0 END)
              |    AS BIGINT) AS n_added,
              |  CAST(sum(CASE WHEN ib IS NULL THEN 1 ELSE 0 END)
              |    AS BIGINT) AS n_removed,
              |  CAST(sum(CASE WHEN ia IS NOT NULL AND ib IS NOT NULL
              |    AND (na IS DISTINCT FROM nb OR ba IS DISTINCT FROM bb)
              |    THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
              |  CAST(sum(CASE WHEN ia IS NOT NULL AND ib IS NOT NULL
              |    AND na IS NOT DISTINCT FROM nb
              |    AND ba IS NOT DISTINCT FROM bb
              |    THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged
              |FROM j""".stripMargin)))
}
