package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.{BpeTrain, Curation, LmSignals, Retrieval, Similarity}

/** Round-6 batch 3+: the retrieval / tokenizer-training / evaluation
  * corner of the LLM-pipeline surface (the reference has none of these;
  * north-star extension operators like the dedup/similarity family):
  * sparse retrieval (inverted index, BM25 corpus-scan AND served from
  * the at-rest index, exact phrase search), BPE tokenizer training +
  * encode + vocab, the deterministic train/val/test split, PMI
  * collocations, the constraint-expectation gate, hard-negative mining,
  * ANN recall evaluation, corpus snapshot diff, and epoch-weighted
  * upsampling.
  */
object R6bQueries {

  private val QueryTerms = Seq("dup", "spark", "vector")

  private val BpeSteps = 8

  /** One training, three consumers (`ta_bpe` / `ta_bpe_vocab` /
    * `ta_bpe_encode`): the learned merge table is memoized per dataset
    * dir. Training is a pure function of the corpus (deterministic
    * tie-breaks, see [[BpeTrain]]), so every consumer observes the
    * identical sequence whether it trained or hit the cache — the
    * composed-pipeline shape VERDICT r6 #3 asked for.
    */
  private val mergeCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(Long, String, String, Long)]]()

  private def learnedMerges(s: org.apache.spark.sql.SparkSession,
                            d: String): Seq[(Long, String, String, Long)] =
    mergeCache.computeIfAbsent(d, _ =>
      BpeTrain.learnMerges(Tables.documents(s, d), "text", BpeSteps)
        .orderBy("step").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
        .toSeq)

  /** Unrolled BPE training as DuckDB CTEs (the unrolled-Lloyd idiom of
    * R5Queries.kmeansCtesOn): w0 = the word-frequency table with each
    * word as its boundary-wrapped symbol string; per step i, `pi` counts
    * adjacent symbol pairs weighted by word frequency, `bi` takes the
    * argmax (count desc, pair asc — the trainer's tie-break), and `wi`
    * applies the winning merge with the same double `replace` the Spark
    * side uses.
    */
  private def bpeCtes(n: Int): String = {
    val sb = new StringBuilder
    sb.append(
      """w0 AS (
        |  SELECT word,
        |    ' ' || array_to_string(string_split(word, ''), ' ') || ' ' AS sym,
        |    count(*) AS freq
        |  FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS word
        |        FROM documents)
        |  WHERE word <> '' GROUP BY word),
        |""".stripMargin)
    for (i <- 1 to n) {
      sb.append(
        s"""p$i AS (
           |  SELECT ws[j] AS l, ws[j+1] AS r, sum(freq) AS cnt FROM (
           |    SELECT ws, freq, unnest(generate_series(1, len(ws) - 1)) AS j
           |    FROM (SELECT string_split(trim(sym), ' ') AS ws, freq FROM w${i - 1}))
           |  GROUP BY 1, 2),
           |b$i AS (SELECT l, r, cnt FROM p$i ORDER BY cnt DESC, l, r LIMIT 1),
           |w$i AS (
           |  SELECT word,
           |    replace(replace(sym, ' ' || b.l || ' ' || b.r || ' ',
           |                         ' ' || b.l || b.r || ' '),
           |            ' ' || b.l || ' ' || b.r || ' ',
           |            ' ' || b.l || b.r || ' ') AS sym,
           |    freq
           |  FROM w${i - 1} CROSS JOIN b$i b),
           |""".stripMargin)
    }
    sb.toString
  }

  val all: Seq[Q] = Seq(

    Q("ta_invindex",
      "Distributed inverted index with the stopword df-cap: distinct " +
        "(term, doc) pairs, df counted first (map-side combinable), the " +
        "stopword band dropped, and ONLY THEN postings collected — the " +
        "collect_list group is bounded by maxDf by construction, so the " +
        "single-key 10^10-id posting list a naive build creates for " +
        "'the' at corpus scale never exists. Postings emitted as the " +
        "numerically-sorted comma-joined id string (engine-portable).",
      (s, d) => Retrieval.invertedIndex(Tables.documents(s, d),
          "doc_id", "text", maxDf = 390L)
        .orderBy("term"),
      Some("""WITH pairs AS (
             |  SELECT DISTINCT doc_id, word AS term FROM (
             |    SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS word
             |    FROM documents)
             |  WHERE word <> ''),
             |dfreq AS (
             |  SELECT term, count(*) AS df FROM pairs
             |  GROUP BY 1 HAVING count(*) <= 390)
             |SELECT term, df,
             |  string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id) AS postings
             |FROM pairs JOIN dfreq USING (term)
             |GROUP BY term, df
             |ORDER BY term""".stripMargin)),

    Q("ta_bm25",
      "BM25 ranked retrieval (k1=1.2, b=0.75) for a 3-term query with " +
        "the log-free Robertson idf (N-df+0.5)/(df+0.5) — monotone in " +
        "the classic ln form, pure IEEE arithmetic (no libm). Terms " +
        "pruned in the scan stage; per-term df is a |query|-row " +
        "broadcast; per-doc sum decimal-cast (order-independent); " +
        "top-k via orderBy().limit = TakeOrderedAndProject.",
      (s, d) => Retrieval.bm25(Tables.documents(s, d),
        "doc_id", "text", QueryTerms, topK = 15),
      Some(s"""WITH base AS (
             |  SELECT doc_id,
             |    list_filter(string_split_regex(trim(text), '\\s+'),
             |                x -> x <> '') AS ws
             |  FROM documents),
             |stats AS (
             |  SELECT cast(sum(len(ws)) AS DOUBLE) / count(*) AS avgdl,
             |         count(*) AS n
             |  FROM base),
             |tf AS (
             |  SELECT doc_id, dl, t, count(*) AS tf FROM (
             |    SELECT doc_id, len(ws) AS dl, unnest(ws) AS t FROM base)
             |  WHERE t IN ('dup', 'spark', 'vector')
             |  GROUP BY 1, 2, 3),
             |dfq AS (SELECT t, count(*) AS df FROM tf GROUP BY 1)
             |SELECT doc_id, count(*) AS n_terms,
             |  cast(floor(sum(cast(
             |    ((cast(n AS DOUBLE) - cast(df AS DOUBLE) + 0.5) /
             |     (cast(df AS DOUBLE) + 0.5)) *
             |    ((cast(tf AS DOUBLE) * 2.2) /
             |     (cast(tf AS DOUBLE) +
             |      1.2 * (1.0 - 0.75 + 0.75 * cast(dl AS DOUBLE) / avgdl)))
             |    AS DECIMAL(38,14))) * 1000000
             |    + cast(0.5 AS DECIMAL(38,14))) AS DOUBLE)
             |    / 1000000.0 AS score
             |FROM tf JOIN dfq USING (t) CROSS JOIN stats
             |GROUP BY doc_id
             |ORDER BY score DESC, doc_id
             |LIMIT 15""".stripMargin)),

    Q("ta_bm25_index",
      "BM25 served from the AT-REST index (the sim_ivf_layout pattern " +
        "for text): writeIndex materializes postings (term, doc, tf, dl) " +
        "range-partitioned and sorted by term plus exact 1-row corpus " +
        "stats; the probe's term IN (...) filter pushes into the " +
        "postings scan (file + row-group pruning) and the corpus is " +
        "never touched. Result is defined bit-identical to ta_bm25 " +
        "(shared scoring tail), so that query's oracle applies verbatim.",
      (s, d) => {
        // per-QUERY deterministic scratch dir (bounded: one per query ×
        // dataset, overwritten each run; deletion can't precede the lazy
        // result's consumption, so the dir persists until the next run) —
        // ta_phrase_index owns a separate dir, so concurrent execution
        // never races a rebuild against a read
        val path = sys.props.getOrElse("java.io.tmpdir", "/tmp") +
          "/graft_bm25_idx_" + d.replaceAll("[^A-Za-z0-9.]", "_")
        Retrieval.writeIndex(Tables.documents(s, d), "doc_id", "text", path)
        Retrieval.bm25FromIndex(s, path, "doc_id", QueryTerms, topK = 15)
      },
      Some(s"""WITH base AS (
             |  SELECT doc_id,
             |    list_filter(string_split_regex(trim(text), '\\s+'),
             |                x -> x <> '') AS ws
             |  FROM documents),
             |stats AS (
             |  SELECT cast(sum(len(ws)) AS DOUBLE) / count(*) AS avgdl,
             |         count(*) AS n
             |  FROM base),
             |tf AS (
             |  SELECT doc_id, dl, t, count(*) AS tf FROM (
             |    SELECT doc_id, len(ws) AS dl, unnest(ws) AS t FROM base)
             |  WHERE t IN ('dup', 'spark', 'vector')
             |  GROUP BY 1, 2, 3),
             |dfq AS (SELECT t, count(*) AS df FROM tf GROUP BY 1)
             |SELECT doc_id, count(*) AS n_terms,
             |  cast(floor(sum(cast(
             |    ((cast(n AS DOUBLE) - cast(df AS DOUBLE) + 0.5) /
             |     (cast(df AS DOUBLE) + 0.5)) *
             |    ((cast(tf AS DOUBLE) * 2.2) /
             |     (cast(tf AS DOUBLE) +
             |      1.2 * (1.0 - 0.75 + 0.75 * cast(dl AS DOUBLE) / avgdl)))
             |    AS DECIMAL(38,14))) * 1000000
             |    + cast(0.5 AS DECIMAL(38,14))) AS DOUBLE)
             |    / 1000000.0 AS score
             |FROM tf JOIN dfq USING (t) CROSS JOIN stats
             |GROUP BY doc_id
             |ORDER BY score DESC, doc_id
             |LIMIT 15""".stripMargin)),

    Q("doc_split",
      "Deterministic stratum-free train/val/test assignment (80/10/10): " +
        "split membership is a pure function of md5(doc_id) against " +
        "integer cumulative thresholds — stable across reruns, retries " +
        "and partition layouts (a moving train/test boundary is silent " +
        "test-set contamination). Zero shuffles: a scan-stage projection.",
      (s, d) => Curation.assignSplit(Tables.documents(s, d), "doc_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select("doc_id", "source", "split")
        .orderBy("doc_id"),
      Some("""SELECT doc_id, source,
             |  CASE
             |    WHEN ('0x' || substring(md5(doc_id::VARCHAR), 1, 4))::BIGINT
             |         < 52428 THEN 'train'
             |    WHEN ('0x' || substring(md5(doc_id::VARCHAR), 1, 4))::BIGINT
             |         < 58982 THEN 'val'
             |    ELSE 'test'
             |  END AS split
             |FROM documents
             |ORDER BY doc_id""".stripMargin)),

    Q("ta_pmi",
      "Top-20 collocations by log-free PMI ratio C2·N/(C1a·C1b) with the " +
        "Church-Hanks min-count guard (>= 5) applied BEFORE the unigram " +
        "joins; counts multiply as doubles (C2·N overflows int64 at " +
        "corpus scale); top-k = TakeOrderedAndProject, tie-broken on the " +
        "bigram text.",
      (s, d) => LmSignals.pmiCollocations(Tables.documents(s, d),
        "text", minCount = 5L, topK = 20),
      Some("""WITH w AS (
             |  SELECT string_split_regex(trim(text), '\s+') AS ws FROM documents),
             |pairs AS (
             |  SELECT ws[i] AS w1, ws[i] || ' ' || ws[i+1] AS big FROM (
             |    SELECT ws, unnest(generate_series(1, len(ws) - 1)) AS i FROM w)),
             |bi AS (
             |  SELECT big, w1, count(*) AS pair_count FROM pairs
             |  GROUP BY 1, 2 HAVING count(*) >= 5),
             |uni AS (
             |  SELECT word, count(*) AS c1 FROM (
             |    SELECT unnest(ws) AS word FROM w)
             |  WHERE word <> '' GROUP BY 1),
             |tot AS (SELECT count(*) AS nbi FROM pairs)
             |SELECT big AS bigram, pair_count,
             |  u1.c1 AS w1_count, u2.c1 AS w2_count,
             |  (cast(pair_count AS DOUBLE) * cast(nbi AS DOUBLE)) /
             |  (cast(u1.c1 AS DOUBLE) * cast(u2.c1 AS DOUBLE)) AS pmi_ratio
             |FROM bi
             |JOIN uni u1 ON bi.w1 = u1.word
             |JOIN uni u2 ON substring(big, length(w1) + 2) = u2.word
             |CROSS JOIN tot
             |ORDER BY pmi_ratio DESC, bigram
             |LIMIT 20""".stripMargin)),

    Q("doc_stratum_k",
      "Exact top-3-per-source deterministic reservoir: the 3 smallest " +
        "md5(doc_id) per stratum. The stratum window only sees a hash-" +
        "prefiltered sliver (per-stratum counts size a bucket threshold, " +
        "broadcast back) — monotone in the ranking key, so provably " +
        "lossless, with a codegen'd raise_error guard on the e^-16 " +
        "undershoot tail. The naive all-rows-through-one-window-partition " +
        "shape never exists.",
      (s, d) => Curation.exactKPerStratum(Tables.documents(s, d),
          "source", "doc_id", k = 3)
        .select("doc_id", "source", "rk")
        .orderBy("source", "doc_id"),
      Some("""WITH ranked AS (
             |  SELECT doc_id, source,
             |    row_number() OVER (PARTITION BY source
             |      ORDER BY md5(doc_id::VARCHAR), doc_id) AS rk
             |  FROM documents)
             |SELECT doc_id, source, rk FROM ranked
             |WHERE rk <= 3
             |ORDER BY source, doc_id""".stripMargin)),

    Q("ta_bpe",
      "BPE tokenizer training: the corpus is read ONCE into the " +
        "vocab-bounded word-frequency table (map-side-combined groupBy), " +
        "which is collected and merge learning runs DRIVER-LOCAL as " +
        "classic fast BPE — incremental pair counts, a pair→words index, " +
        "zero Spark jobs per merge (the r6 formulation serialized one " +
        "job per merge: a scheduling-overhead scale-killer at real 32k+ " +
        "merge budgets). The oracle replays all 8 iterations unrolled " +
        "(the unrolled-Lloyd idiom), so the learned merge SEQUENCE " +
        "hash-matches bit-for-bit.",
      (s, d) => {
        val sp = s; import sp.implicits._
        learnedMerges(s, d)
          .toDF("step", "merge_left", "merge_right", "pair_count")
      },
      Some {
        val steps = (1 to BpeSteps).map(i =>
          s"SELECT CAST($i AS BIGINT) AS step, l AS merge_left, " +
            s"r AS merge_right, CAST(cnt AS BIGINT) AS pair_count FROM b$i")
          .mkString("\n UNION ALL ")
        s"WITH ${bpeCtes(BpeSteps)}m AS (\n $steps)\nSELECT * FROM m ORDER BY step"
      }),

    Q("ta_phrase",
      "Exact phrase search ('spark join', adjacent and in order) as ONE " +
        "scan-stage expression — word array staged per row, candidate " +
        "start offsets filtered with indexed lookups; no shuffle, no " +
        "positional self-join (which would shuffle the whole token " +
        "stream per phrase word).",
      (s, d) => Retrieval.phraseSearch(Tables.documents(s, d),
          "doc_id", "text", Seq("spark", "join"))
        .orderBy("doc_id"),
      Some("""WITH w AS (
             |  SELECT doc_id,
             |    list_filter(string_split_regex(trim(text), '\s+'),
             |                x -> x <> '') AS ws
             |  FROM documents)
             |SELECT doc_id, count(*) AS n_matches
             |FROM (SELECT doc_id, ws,
             |        unnest(generate_series(1, len(ws) - 1)) AS i
             |      FROM w WHERE len(ws) >= 2)
             |WHERE ws[i] = 'spark' AND ws[i+1] = 'join'
             |GROUP BY doc_id
             |ORDER BY doc_id""".stripMargin)),

    Q("ta_phrase_index",
      "Phrase search served from the positional at-rest index: postings " +
        "scan reads ONLY the phrase's terms (pushed filter on the " +
        "term-ranged layout), per-term position lists join co-partitioned " +
        "on the doc id, adjacency = shifted position containment. Same " +
        "answer as ta_phrase without touching the corpus, so that " +
        "query's oracle applies verbatim.",
      (s, d) => {
        // own scratch dir — see ta_bm25_index's path note
        val path = sys.props.getOrElse("java.io.tmpdir", "/tmp") +
          "/graft_phrase_idx_" + d.replaceAll("[^A-Za-z0-9.]", "_")
        Retrieval.writeIndex(Tables.documents(s, d), "doc_id", "text", path)
        Retrieval.phraseFromIndex(s, path, "doc_id", Seq("spark", "join"))
          .orderBy("doc_id")
      },
      Some("""WITH w AS (
             |  SELECT doc_id,
             |    list_filter(string_split_regex(trim(text), '\s+'),
             |                x -> x <> '') AS ws
             |  FROM documents)
             |SELECT doc_id, count(*) AS n_matches
             |FROM (SELECT doc_id, ws,
             |        unnest(generate_series(1, len(ws) - 1)) AS i
             |      FROM w WHERE len(ws) >= 2)
             |WHERE ws[i] = 'spark' AND ws[i+1] = 'join'
             |GROUP BY doc_id
             |ORDER BY doc_id""".stripMargin)),

    Q("sim_recall",
      "Recall@10 of the trained-IVF ANN against exact brute force — the " +
        "evaluation gate every index build runs before being trusted " +
        "(tune nprobe until recall clears the bar). Exact and approx " +
        "lists are both deterministic, so the recall itself is a " +
        "hash-checkable scalar; the oracle replays the full Lloyd chain, " +
        "the nprobe probe, the exact ranking, and the intersection.",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val q = Similarity.vectorOf(emb, "vec_id", "embedding", 0L)
        val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 10)
        val approx = Similarity.ivfTrainedTopK(emb, "vec_id", "embedding", q,
          k = 10, nprobe = 2, kClusters = R5Queries.K, iters = R5Queries.ITERS)
        Similarity.recallAtK(exact, approx, "vec_id", 10)
      },
      Some {
        val aFinal = s"a${R5Queries.ITERS + 1}"
        s"""WITH ${R5Queries.kmeansCtesOn("embeddings")},
           |${R5Queries.ivfProbeCtes(nprobe = 2)},
           |approx AS (
           |  SELECT d.vec_id
           |  FROM dots d JOIN ne USING (vec_id)
           |       JOIN $aFinal ass USING (vec_id), nq
           |  WHERE ass.cluster IN (SELECT cluster FROM short)
           |  ORDER BY d.dot / (ne.nrm * nq.nrm) DESC, d.vec_id LIMIT 10),
           |exact AS (
           |  SELECT d.vec_id FROM dots d JOIN ne USING (vec_id), nq
           |  ORDER BY d.dot / (ne.nrm * nq.nrm) DESC, d.vec_id LIMIT 10)
           |SELECT CAST(10 AS BIGINT) AS k,
           |  count(*) AS hits,
           |  CASE WHEN (SELECT count(*) FROM exact) > 0
           |    THEN CAST(count(*) AS DOUBLE) /
           |         (SELECT count(*) FROM exact)
           |    ELSE 0.0 END AS recall
           |FROM approx JOIN exact USING (vec_id)""".stripMargin
      }),

    Q("doc_diff",
      "Corpus snapshot diff (dataset versioning): two derived snapshots " +
        "of documents compared by content fingerprint — md5 computed in " +
        "each scan stage (text never shuffles, only id + 32-byte hash), " +
        "one co-partitioned full-outer join, null-safe status " +
        "projection. added/removed/changed/unchanged per id; " +
        "incremental reprocessing keys off added+changed.",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val prev = docs.filter(col("doc_id") % 13 =!= 0)
          .withColumn("text",
            when(col("doc_id") % 7 === 0, concat(col("text"), lit(" v1")))
              .otherwise(col("text")))
        val cur = docs.filter(col("doc_id") % 19 =!= 4)
        Curation.snapshotDiff(prev, cur, "doc_id", "text").orderBy("doc_id")
      },
      Some("""WITH prev AS (
             |  SELECT doc_id,
             |    CASE WHEN doc_id % 7 = 0 THEN text || ' v1' ELSE text END AS text
             |  FROM documents WHERE doc_id % 13 <> 0),
             |cur AS (SELECT doc_id, text FROM documents WHERE doc_id % 19 <> 4)
             |SELECT coalesce(p.doc_id, c.doc_id) AS doc_id,
             |  CASE WHEN p.doc_id IS NULL THEN 'added'
             |       WHEN c.doc_id IS NULL THEN 'removed'
             |       WHEN md5(p.text) IS NOT DISTINCT FROM md5(c.text)
             |         THEN 'unchanged'
             |       ELSE 'changed' END AS status
             |FROM prev p FULL OUTER JOIN cur c ON p.doc_id = c.doc_id
             |ORDER BY doc_id""".stripMargin)),

    Q("doc_epochs",
      "Epoch-weighted upsampling — mixture rates ABOVE 1 (a pretraining " +
        "mix seeing curated sources several times per epoch): floor(rate) " +
        "copies per row plus one more when the md5 bucket falls under the " +
        "fractional remainder; deterministic, exactly rate*n rows per " +
        "source in expectation. Scan-stage explode(sequence(...)) — rows " +
        "expand in the map stage, no shuffle, no dimension join.",
      (s, d) => Curation.epochUpsample(Tables.documents(s, d),
          "source", "doc_id",
          rates = Map("src0" -> 2.5, "src1" -> 0.5), defaultRate = 1.0)
        .select("doc_id", "source", "epoch")
        .orderBy("doc_id", "epoch"),
      Some("""WITH rated AS (
             |  SELECT doc_id, source,
             |    CASE WHEN source = 'src0' THEN 2.5
             |         WHEN source = 'src1' THEN 0.5
             |         ELSE 1.0 END AS rate,
             |    ('0x' || substring(md5(doc_id::VARCHAR), 1, 4))::BIGINT AS b
             |  FROM documents),
             |n AS (
             |  SELECT doc_id, source,
             |    CAST(floor(rate) AS BIGINT) +
             |      CASE WHEN b < (rate - floor(rate)) * 65536
             |           THEN 1 ELSE 0 END AS n
             |  FROM rated)
             |SELECT doc_id, source,
             |       unnest(generate_series(0, n - 1)) AS epoch
             |FROM n WHERE n > 0
             |ORDER BY doc_id, epoch""".stripMargin)),

    Q("sim_hardneg",
      "Hard-negative mining (DPR/SimCSE-style): for each of 3 anchors, " +
        "the 5 most-similar DIFFERENT-label vectors. Anchor batch " +
        "broadcasts, corpus scanned once for all anchors, per-anchor " +
        "top-k via the TopKByKey TypedImperativeAggregate (shuffle <= k " +
        "rows per task-anchor — never a corpus-sized window partition). " +
        "Oracle restates it as the window query over exact decimal " +
        "cosines.",
      (s, d) => Similarity.hardNegatives(Tables.embeddings(s, d),
          "vec_id", "embedding", "label", anchorIds = Seq(0L, 1L, 2L), k = 5)
        .orderBy("anchor_id", "rank"),
      Some {
        val dot = (a: String, b: String) =>
          s"cast(sum(cast($a[i]::DOUBLE * $b[i]::DOUBLE AS DECIMAL(38,14))) AS DOUBLE)"
        s"""WITH anchors AS (
           |  SELECT vec_id AS anchor_id, embedding AS ae, label AS albl
           |  FROM embeddings WHERE vec_id IN (0, 1, 2)),
           |na AS (
           |  SELECT anchor_id, greatest(sqrt(${dot("ae", "ae")}), 1e-30) AS nrm
           |  FROM anchors, generate_series(1, 64) g(i) GROUP BY anchor_id),
           |ne AS (
           |  SELECT vec_id, greatest(sqrt(${dot("embedding", "embedding")}), 1e-30) AS nrm
           |  FROM embeddings, generate_series(1, 64) g(i) GROUP BY vec_id),
           |dots AS (
           |  SELECT a.anchor_id, e.vec_id,
           |         ${dot("e.embedding", "a.ae")} AS dot
           |  FROM embeddings e CROSS JOIN anchors a,
           |       generate_series(1, 64) g(i)
           |  WHERE e.label IS DISTINCT FROM a.albl
           |  GROUP BY a.anchor_id, e.vec_id),
           |ranked AS (
           |  SELECT d.anchor_id, d.vec_id AS neg_id,
           |         d.dot / (ne.nrm * na.nrm) AS cos_sim,
           |         row_number() OVER (PARTITION BY d.anchor_id
           |           ORDER BY d.dot / (ne.nrm * na.nrm) DESC, d.vec_id) AS rank
           |  FROM dots d
           |  JOIN ne ON d.vec_id = ne.vec_id
           |  JOIN na ON d.anchor_id = na.anchor_id)
           |SELECT anchor_id, rank, neg_id, cos_sim FROM ranked
           |WHERE rank <= 5
           |ORDER BY anchor_id, rank""".stripMargin
      }),

    Q("ta_bpe_vocab",
      "The tokenizer's shipped piece inventory: every symbol left after " +
        "the 8 learned merges, with corpus-frequency-weighted counts — " +
        "computed on the vocab-bounded word table (one corpus scan), " +
        "merges applied exactly as in encode. Oracle re-derives the " +
        "merges (unrolled CTEs) and explodes the final word table's " +
        "symbol strings.",
      (s, d) => {
        val merges = learnedMerges(s, d).map(m => (m._2, m._3))
        BpeTrain.vocab(Tables.documents(s, d), "text", merges)
          .orderBy("piece")
      },
      Some(
        s"""WITH ${bpeCtes(BpeSteps)}v AS (
           |  SELECT unnest(string_split(trim(sym), ' ')) AS piece, freq
           |  FROM w$BpeSteps)
           |SELECT piece, CAST(sum(freq) AS BIGINT) AS n
           |FROM v GROUP BY piece ORDER BY piece""".stripMargin)),

    Q("dq_expect",
      "Constraint-expectation gate (the dbt-test shape): four row-level " +
        "rules over lineitem evaluated as ONE conditional-aggregation " +
        "pass — sum(CASE WHEN NOT rule) per rule on a single scan, " +
        "never a scan per rule; NULL predicate results count as " +
        "violations. The report is data: callers gate on n_violations.",
      (s, d) => graft.ops.Profile.expect(Tables.lineitem(s, d), Seq(
          "quantity_positive" -> (col("l_quantity") > 0),
          "quantity_under_30" -> (col("l_quantity") < 30),
          "returnflag_domain" -> col("l_returnflag").isin("A", "N", "R"),
          "discount_range" -> (col("l_discount") >= 0 && col("l_discount") <= 0.05)))
        .orderBy("rule"),
      Some("""SELECT rule, n_violations, n_rows FROM (
             |  SELECT 'quantity_positive' AS rule,
             |    coalesce(CAST(sum(CASE WHEN coalesce(l_quantity > 0, false)
             |        THEN 0 ELSE 1 END) AS BIGINT), 0) AS n_violations,
             |    count(*) AS n_rows FROM lineitem
             |  UNION ALL
             |  SELECT 'quantity_under_30',
             |    coalesce(CAST(sum(CASE WHEN coalesce(l_quantity < 30, false)
             |        THEN 0 ELSE 1 END) AS BIGINT), 0), count(*) FROM lineitem
             |  UNION ALL
             |  SELECT 'returnflag_domain',
             |    coalesce(CAST(sum(CASE WHEN coalesce(l_returnflag IN ('A','N','R'), false)
             |        THEN 0 ELSE 1 END) AS BIGINT), 0), count(*) FROM lineitem
             |  UNION ALL
             |  SELECT 'discount_range',
             |    coalesce(CAST(sum(CASE WHEN coalesce(l_discount >= 0 AND l_discount <= 0.05,
             |        false) THEN 0 ELSE 1 END) AS BIGINT), 0), count(*) FROM lineitem)
             |ORDER BY rule""".stripMargin)),

    Q("ta_bpe_encode",
      "Tokenize the corpus with the merges learned by ta_bpe: the merge " +
        "table is applied as a driver-side literal replace chain (a " +
        "loaded tokenizer), so the whole encode is one shuffle-free " +
        "codegen'd projection over the exploded words. Oracle re-derives " +
        "the merges and joins the final word->pieces map back onto the " +
        "corpus words — same result through a different (but equivalent) " +
        "relational path.",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val merges = learnedMerges(s, d).map(m => (m._2, m._3))
        BpeTrain.encode(docs, "doc_id", "text", merges)
          .select(col("doc_id"), col("word_pos"),
            array_join(col("pieces"), " ").as("pieces"))
          .orderBy("doc_id", "word_pos")
      },
      Some(
        s"""WITH ${bpeCtes(BpeSteps)}tok AS (
           |  SELECT doc_id, j - 1 AS word_pos, ws[j] AS word FROM (
           |    SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS j
           |    FROM (SELECT doc_id,
           |            list_filter(string_split_regex(trim(text), '\\s+'),
           |                        x -> x <> '') AS ws
           |          FROM documents)))
           |SELECT doc_id, word_pos, trim(w$BpeSteps.sym) AS pieces
           |FROM tok JOIN w$BpeSteps USING (word)
           |ORDER BY doc_id, word_pos""".stripMargin)))
}
