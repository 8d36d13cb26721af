package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{Curation, Dedup, EventOps, Graphs, Multimodal, Profile,
  TextAnalysis}

/** Round-9 session-6 additions: robust MAD outliers, DAU/MAU stickiness,
  * inter-arrival latency percentiles, Flesch readability, S-stemmer
  * vocabulary families, LPA modularity decomposition, video scene cuts,
  * the per-slice PII incidence report, and the streaming table
  * fingerprint — each oracle-gated on the exact cross-engine surface.
  */
object R22Queries {

  /** The dq_quantiles_by oracle tail (est + within_bin restated from the
    * exact quantile), shared by ev_interarrival.
    */
  private def quantileTail(bins: Int): String =
    s"""SELECT k AS key, q, quantile,
       |  CASE WHEN hi = lo THEN lo
       |       ELSE lo + least(floor((quantile - lo) /
       |                             ((hi - lo) / $bins.0)), ${bins - 1}) *
       |            ((hi - lo) / $bins.0) END AS est,
       |  abs(quantile -
       |    (CASE WHEN hi = lo THEN lo
       |          ELSE lo + least(floor((quantile - lo) /
       |                                ((hi - lo) / $bins.0)), ${bins - 1}) *
       |               ((hi - lo) / $bins.0) END))
       |    <= (CASE WHEN hi = lo THEN 0.0
       |             ELSE (hi - lo) / $bins.0 END) AS within_bin
       |FROM ex
       |ORDER BY key, q""".stripMargin

  val all: Seq[Q] = Seq(

    Q("dq_mad",
      "Robust per-key outlier report: median +- 3*MAD, the gate a " +
        "single wild value cannot move (center and spread are order " +
        "statistics with 50% breakdown, unlike dq_outliers' mean/sigma). " +
        "Two histogram-guided exact-quantile rounds (per-key median, " +
        "then per-key median of |v - median|) - six scans total for any " +
        "key count, never a global sort - then one keyed aggregate " +
        "counts deviations past 3*MAD. Both medians are values at " +
        "positions, |v-med| is one IEEE subtraction per row, the " +
        "threshold one multiply - every cell replays from a rank-based " +
        "oracle.",
      (s, d) => Profile.madOutliers(Tables.lineitem(s, d),
        "l_returnflag", "l_extendedprice", k = 3.0),
      Some("""WITH v AS (
             |  SELECT l_returnflag AS k, l_extendedprice::DOUBLE AS v
             |  FROM lineitem
             |  WHERE l_returnflag IS NOT NULL
             |    AND l_extendedprice IS NOT NULL),
             |med AS (
             |  SELECT k, v AS med FROM (
             |    SELECT k, v,
             |      row_number() OVER (PARTITION BY k ORDER BY v) AS rn,
             |      count(*) OVER (PARTITION BY k) AS n FROM v)
             |  WHERE rn = greatest(CAST(ceil(0.5 * n) AS BIGINT), 1)),
             |dev AS (
             |  SELECT v.k, abs(v.v - m.med) AS d, m.med
             |  FROM v JOIN med m ON v.k = m.k),
             |mad AS (
             |  SELECT k, d AS mad FROM (
             |    SELECT k, d,
             |      row_number() OVER (PARTITION BY k ORDER BY d) AS rn,
             |      count(*) OVER (PARTITION BY k) AS n FROM dev)
             |  WHERE rn = greatest(CAST(ceil(0.5 * n) AS BIGINT), 1))
             |SELECT dev.k AS key, count(*) AS n, max(dev.med) AS median,
             |  max(ma.mad) AS mad,
             |  CAST(sum(CASE WHEN dev.d > 3.0 * ma.mad THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_outliers,
             |  max(dev.d) AS max_dev
             |FROM dev JOIN mad ma ON ma.k = dev.k
             |GROUP BY dev.k ORDER BY key""".stripMargin)),

    Q("ev_stickiness",
      "DAU/MAU stickiness per day - the engagement-intensity board: of " +
        "the users active in the trailing 28 days, what fraction showed " +
        "up today. Both counts come from ONE rollingActiveUsers pass " +
        "(the two windows share the deduped (user, day) relation and " +
        "its coverage expansion); zero-activity days inside the MAU " +
        "window report dau = 0. The ratio is the only double - one " +
        "division of two exact longs per day.",
      (s, d) => EventOps.stickiness(Tables.events(s, d),
        "user_id", "ts", mauWindow = 28),
      Some("""WITH daily AS (
             |  SELECT DISTINCT user_id AS u, ts::DATE AS day FROM events),
             |b AS (SELECT max(day) AS d1 FROM daily),
             |ks AS (SELECT cast(k AS INTEGER) AS k
             |       FROM generate_series(0, 27) g(k)),
             |mau AS (
             |  SELECT cover, count(*) AS mau FROM (
             |    SELECT DISTINCT daily.u, daily.day + ks.k AS cover
             |    FROM daily, ks) cov, b
             |  WHERE cover <= d1 GROUP BY cover),
             |dau AS (SELECT day, count(*) AS dau FROM daily GROUP BY day)
             |SELECT strftime(m.cover, '%Y-%m-%d') AS day,
             |  COALESCE(da.dau, 0) AS dau, m.mau,
             |  CAST(COALESCE(da.dau, 0) AS DOUBLE) / CAST(m.mau AS DOUBLE)
             |    AS stickiness
             |FROM mau m LEFT JOIN dau da ON da.day = m.cover
             |ORDER BY day""".stripMargin)),

    Q("ev_interarrival",
      "Exact inter-arrival-gap percentiles per event type (p50/p90/p99 " +
        "of consecutive same-user gaps in event-time micros) - the " +
        "'how often do users purchase' latency profile. Gaps are one " +
        "user-keyed window lag (ties broken by event_id - " +
        "deterministic lag sequence cross-engine), long subtraction; " +
        "the percentiles are dq_quantiles_by's histogram-guided " +
        "selection - three scans for all keys x quantiles, no global " +
        "sort.",
      (s, d) => Profile.quantilesByKey(
        EventOps.interarrivalGaps(Tables.events(s, d),
          "user_id", "ts", "event_type", "event_id"),
        "event_type", "gap_us", Seq(0.5, 0.9, 0.99), bins = 256),
      Some(s"""WITH g AS (
              |  SELECT event_type AS k,
              |    CAST(epoch_us(ts) - lag(epoch_us(ts)) OVER (
              |      PARTITION BY event_type, user_id
              |      ORDER BY ts, event_id) AS DOUBLE) AS v
              |  FROM events),
              |v AS (SELECT k, v FROM g
              |      WHERE k IS NOT NULL AND v IS NOT NULL),
              |st AS (
              |  SELECT k, count(*) AS n, min(v) AS lo, max(v) AS hi
              |  FROM v GROUP BY k),
              |qs(q) AS (VALUES (0.5::DOUBLE), (0.9::DOUBLE),
              |                 (0.99::DOUBLE)),
              |r AS (
              |  SELECT k, v,
              |    row_number() OVER (PARTITION BY k ORDER BY v) AS rn
              |  FROM v),
              |ex AS (
              |  SELECT st.k, qs.q, st.lo, st.hi,
              |    (SELECT r.v FROM r WHERE r.k = st.k
              |     AND rn = greatest(CAST(ceil(qs.q * st.n) AS BIGINT), 1))
              |      AS quantile
              |  FROM st, qs)
              |${quantileTail(256)}""".stripMargin)),

    Q("ta_readability",
      "Flesch reading-ease report per source - the classic of the " +
        "quality-scoring family: words, sentence terminators, and a " +
        "vowel-group syllable proxy (clamped below by the word count) " +
        "are three regexp_extract_all lengths per doc, summed per " +
        "slice map-side; the Flesch score and words-per-sentence are " +
        "fixed double expressions over the exact longs - identical " +
        "IEEE op sequences both engines. Pure scan-stage expressions " +
        "+ one keyed aggregate.",
      (s, d) => TextAnalysis.readability(Tables.documents(s, d),
        "text", "source"),
      Some("""WITH d AS (
             |  SELECT source,
             |    len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w,
             |    greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS s,
             |    len(regexp_extract_all(lower(text), '[aeiouy]+')) AS vg
             |  FROM documents),
             |g AS (
             |  SELECT source, count(*) AS n_docs,
             |    CAST(sum(w) AS BIGINT) AS nw,
             |    CAST(sum(s) AS BIGINT) AS ns,
             |    CAST(sum(greatest(vg, w)) AS BIGINT) AS ny
             |  FROM d GROUP BY source)
             |SELECT source, n_docs, nw AS n_words, ns AS n_sentences,
             |  ny AS n_syllables,
             |  CAST(nw AS DOUBLE) / CAST(ns AS DOUBLE)
             |    AS words_per_sentence,
             |  206.835 - 1.015 * (CAST(nw AS DOUBLE) / CAST(ns AS DOUBLE))
             |    - 84.6 * (CAST(ny AS DOUBLE) / CAST(nw AS DOUBLE))
             |    AS flesch
             |FROM g ORDER BY source""".stripMargin)),

    Q("ta_stem",
      "Top-30 stem families under Harman's S-stemmer (1991): lowercase " +
        "alpha tokens, the three suffix rules (ies->y unless e/a-" +
        "preceded; es->e unless a/e/o-preceded; drop a final s unless " +
        "us/ss) as one CASE chain of suffix tests + substrings - zero " +
        "per-row regex beyond tokenization, exact cross-engine. One " +
        "tokenize scan, a (stem, form) aggregate, a stem rollup " +
        "(tokens + distinct surface forms), TakeOrderedAndProject " +
        "top-k - never a global sort.",
      (s, d) => TextAnalysis.topStems(Tables.documents(s, d), "text", 30),
      Some("""WITH t AS (
             |  SELECT unnest(regexp_extract_all(lower(text), '[a-z]+'))
             |    AS w
             |  FROM documents),
             |st AS (
             |  SELECT CASE
             |    WHEN w LIKE '%ies' THEN
             |      CASE WHEN w LIKE '%eies' OR w LIKE '%aies' THEN w
             |           ELSE substring(w, 1, len(w) - 3) || 'y' END
             |    WHEN w LIKE '%es' THEN
             |      CASE WHEN w LIKE '%aes' OR w LIKE '%ees'
             |             OR w LIKE '%oes' THEN w
             |           ELSE substring(w, 1, len(w) - 1) END
             |    WHEN w LIKE '%s' THEN
             |      CASE WHEN w LIKE '%us' OR w LIKE '%ss' THEN w
             |           ELSE substring(w, 1, len(w) - 1) END
             |    ELSE w END AS stem, w
             |  FROM t),
             |f AS (SELECT stem, w, count(*) AS c FROM st GROUP BY 1, 2)
             |SELECT stem, CAST(sum(c) AS BIGINT) AS n_tokens,
             |  count(*) AS n_forms
             |FROM f GROUP BY stem
             |ORDER BY n_tokens DESC, stem LIMIT 30""".stripMargin)),

    Q("graph_modularity",
      "Per-community modularity decomposition (Newman & Girvan 2004) " +
        "of the LPA communities over the near-dup graph: size, intra-" +
        "community edges e_c, degree mass d_c, and the additive term " +
        "e_c/m - (d_c/2m)^2 whose sum is Newman's Q - kept per " +
        "community so the audit says WHICH duplicate families are " +
        "genuinely dense. The cached symmetric edge list is the only " +
        "data-sized relation (one degree count, two node-keyed label " +
        "joins); every term input is an exact integer, so the oracle " +
        "replays the doubles bit-for-bit on top of the unrolled LPA " +
        "rounds.",
      (s, d) => Graphs.modularity(
        Dedup.minhashCandidates(Tables.documents(s, d), "doc_id", "text",
          Dedup.Shingler.words(5), bandsN = 2, rowsPerBand = 3),
        "id_a", "id_b", iters = R14Queries.LpaIters),
      Some(s"""WITH ${R14Queries.edgeCtes},
              |${R14Queries.lpaCtes},
              |labels AS MATERIALIZED (
              |  SELECT id, lbl AS community FROM l${R14Queries.LpaIters}),
              |deg AS (SELECT src AS id, count(*) AS d FROM edges
              |        GROUP BY src),
              |tot AS (SELECT count(*) AS L FROM edges),
              |ns AS (
              |  SELECT la.community, count(*) AS n_nodes,
              |    CAST(sum(d.d) AS BIGINT) AS degree_sum
              |  FROM labels la JOIN deg d ON d.id = la.id
              |  GROUP BY la.community),
              |intra AS (
              |  SELECT la.community, count(*) AS i2
              |  FROM edges e JOIN labels la ON la.id = e.src
              |       JOIN labels lb ON lb.id = e.dst
              |        AND lb.community = la.community
              |  GROUP BY la.community)
              |SELECT ns.community, ns.n_nodes,
              |  COALESCE(i.i2, 0) // 2 AS intra_edges,
              |  ns.degree_sum,
              |  CAST(COALESCE(i.i2, 0) AS DOUBLE) / CAST(t.L AS DOUBLE)
              |    - (CAST(ns.degree_sum AS DOUBLE) / CAST(t.L AS DOUBLE))
              |      * (CAST(ns.degree_sum AS DOUBLE) / CAST(t.L AS DOUBLE))
              |    AS modularity_term
              |FROM ns LEFT JOIN intra i ON i.community = ns.community
              |CROSS JOIN tot t
              |ORDER BY ns.community""".stripMargin)),

    Q("mm_scenecut",
      "Video scene-cut detection with a REAL multi-frame decoder: the " +
        "animated-GIF fixture decodes per frame into an exact integer " +
        "RGB energy, and a cut is a frame whose mean per-pixel gray " +
        "jumps >= 16 levels from its predecessor - compared as " +
        "|dE| >= 16*3*n_pixels, cross-multiplied integers, no " +
        "division. Per video: frames, cuts, first cut frame (the " +
        "fixture's mod-64 gray walk wraps at deterministic frames - " +
        "|delta| is 11 or 53, so the 16 threshold detects exactly the " +
        "wraps). One per-id window lag + one keyed aggregate.",
      (s, d) => Multimodal.sceneCuts(
        Multimodal.frameEnergies(
          Multimodal.gifFixture(
            Tables.documents(s, d).select(col("doc_id")), "doc_id"),
          "doc_id", "payload"),
        "doc_id", threshold = 16),
      Some("""WITH f AS (
             |  SELECT doc_id,
             |    unnest(generate_series(0,
             |      CAST(2 + doc_id % 4 AS INT) - 1)) AS i
             |  FROM documents),
             |e AS (
             |  SELECT doc_id, i,
             |    CAST(3 * 48 * (32 + (doc_id * 7 + i * 11) % 64)
             |      AS BIGINT) AS energy
             |  FROM f),
             |d AS (
             |  SELECT doc_id, i,
             |    abs(energy - lag(energy) OVER (PARTITION BY doc_id
             |      ORDER BY i)) AS de
             |  FROM e)
             |SELECT doc_id, count(*) AS n_frames,
             |  CAST(sum(CASE WHEN de >= 16 * 3 * 48 THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_cuts,
             |  min(CASE WHEN de >= 16 * 3 * 48 THEN i END) AS first_cut
             |FROM d GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    Q("doc_pii_report",
      "PII incidence report per source - the aggregate view over " +
        "ta_redact's planted-PII surface: docs scanned, docs carrying " +
        "any match, and per-pattern match totals (email / SSN-shaped / " +
        "long-number), all exact integer regexp_extract_all counts " +
        "summed map-side in one scan. The go/no-go slice report a " +
        "release audit reads before the redaction pass ships.",
      (s, d) => Tables.documents(s, d)
        .select(col("source"), R3Queries.piiText.as("t"))
        .select(col("source"),
          Curation.matchCount(col("t"), Curation.EmailRe).as("__e"),
          Curation.matchCount(col("t"), Curation.SsnRe).as("__s"),
          Curation.matchCount(col("t"), Curation.LongNumberRe).as("__i"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("__e") + col("__s") + col("__i") > 0, 1L)
            .otherwise(0L)).as("docs_with_pii"),
          sum(col("__e").cast("long")).as("n_emails"),
          sum(col("__s").cast("long")).as("n_ssn"),
          sum(col("__i").cast("long")).as("n_ids"))
        .orderBy(col("source")),
      Some(s"""WITH p AS (
              |  SELECT source, ${R3Queries.piiSql} AS t FROM documents),
              |c AS (
              |  SELECT source,
              |    len(regexp_extract_all(t, '${R3Queries.emailSql}')) AS e,
              |    len(regexp_extract_all(t, '${R3Queries.ssnSql}')) AS s,
              |    len(regexp_extract_all(t, '${R3Queries.numSql}')) AS i
              |  FROM p)
              |SELECT source, count(*) AS n_docs,
              |  CAST(sum(CASE WHEN e + s + i > 0 THEN 1 ELSE 0 END)
              |    AS BIGINT) AS docs_with_pii,
              |  CAST(sum(e) AS BIGINT) AS n_emails,
              |  CAST(sum(s) AS BIGINT) AS n_ssn,
              |  CAST(sum(i) AS BIGINT) AS n_ids
              |FROM c GROUP BY source ORDER BY source""".stripMargin)),

    Q("stream_checksum",
      "Structured Streaming maintains the TABLE FINGERPRINT: the " +
        "historical third of lineitem bootstraps batch 0's checksum " +
        "partial (count, decimal hash sum, xor, max - all algebraic), " +
        "each micro-batch appends its own 1-row partial under the " +
        "micro-batch id (idempotent marker-committed write), and " +
        "serving merges committed partials - bit-identical to one " +
        "batch pass over everything ingested, which is what the " +
        "shared dq_checksum oracle checks. The ingest audit stays " +
        "current at O(batch) per refresh; history is never rescanned.",
      (s, d) => {
        val path = graft.streaming.EventStream.runChecksumStream(s, d,
          sys.props.getOrElse("java.io.tmpdir", "/tmp") +
            "/graft_stream_checksum_" + d.replaceAll("[^A-Za-z0-9.]", "_"))
        Profile.checksumServe(s, path)
      },
      Some("""WITH h AS (
             |  SELECT CAST(('0x' || substring(md5(
             |    CAST(l_orderkey AS VARCHAR) || chr(1) ||
             |    CAST(l_partkey AS VARCHAR) || chr(1) ||
             |    CAST(l_suppkey AS VARCHAR) || chr(1) ||
             |    CAST(l_linenumber AS VARCHAR) || chr(1) ||
             |    l_returnflag || chr(1) || l_linestatus || chr(1) ||
             |    strftime(l_shipdate, '%Y-%m-%d')), 1, 15)) AS BIGINT)
             |    AS hh
             |  FROM lineitem)
             |SELECT count(*) AS n_rows,
             |  CAST(CAST(sum(hh) AS DECIMAL(38,0)) AS VARCHAR)
             |    AS checksum_sum,
             |  bit_xor(hh) AS checksum_xor,
             |  max(hh) AS checksum_max
             |FROM h""".stripMargin)))
}
