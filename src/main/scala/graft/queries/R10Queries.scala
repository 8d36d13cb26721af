package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.{Curation, Dedup, EntityResolution, EventOps, Graphs, IncrementalAgg, Profile, Similarity}

/** Round-8 session, part 2: the event-sequence analytics family beyond
  * funnel/retention — next-event transition matrix, last-touch
  * attribution, dense gap-fill — plus the new operator families added
  * this round (binary ANN, entity resolution, incremental aggregates,
  * length-bucketed batching) registered in their own files.
  */
object R10Queries {

  /** DuckDB restatement of Dedup.dotExact over index i (1-based) — the
    * shared R5Queries helper, not a fourth private copy: the staging
    * depth must stay identical across every query file's oracle.
    */
  private def dotSql(a: String, b: String): String =
    R5Queries.dotSql(a, b)

  /** Shared CTEs for the binary-embedding family: sign-packed 32-bit
    * halves per vector, the query's words, Hamming distances, the
    * shortlist, and the query-vector norm for the exact rescore tail.
    */
  private def hammingCtes(rescore: Int): String =
    s"""bits AS (
       |  SELECT vec_id,
       |    cast(sum(CASE WHEN embedding[i] > 0
       |             THEN (1::BIGINT << (i-1)) ELSE 0 END) AS BIGINT) AS blo,
       |    cast(sum(CASE WHEN embedding[i+32] > 0
       |             THEN (1::BIGINT << (i-1)) ELSE 0 END) AS BIGINT) AS bhi
       |  FROM embeddings, generate_series(1, 32) g(i) GROUP BY vec_id),
       |qb AS (SELECT blo AS qlo, bhi AS qhi FROM bits WHERE vec_id = 0),
       |hd AS (
       |  SELECT b.vec_id,
       |    cast(bit_count(xor(b.blo, qb.qlo)) +
       |         bit_count(xor(b.bhi, qb.qhi)) AS BIGINT) AS hamming
       |  FROM bits b, qb),
       |short AS (SELECT * FROM hd ORDER BY hamming, vec_id LIMIT $rescore),
       |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |nq AS (
       |  SELECT sqrt(${dotSql("qe", "qe")}) AS nrm
       |  FROM q, generate_series(1, 64) g(i))""".stripMargin

  /** The ER fixture: the clean customer registry plus a deterministic
    * dirty copy covering the edit classes a radius-1 resolver must
    * handle — a 1-in-30 slice of LAST-CHAR truncations (ambiguous:
    * such a name is one insertion from every clean key in its decade,
    * producing genuine multi-entity clusters), one-third mid-name
    * substitutions, one-third mid-name deletions (both unambiguous —
    * they edit the shared "Customer" prefix, so the only clean name
    * within distance 1 is the record's own source), and the rest exact
    * re-keys. The truncation share is deliberately small: real dirty
    * data has occasional ambiguous records, not a bridge per record —
    * and an all-truncation fixture chains every decade into one
    * mega-component whose diameter makes CC pay tens of rounds
    * (measured 65 s at sf0.1) while teaching nothing new. Dirty ids
    * live at +1,000,000 so the two id spaces never collide.
    */
  private[queries] val erSourceCtes: String =
    """clean AS (SELECT c_custkey AS id, c_name AS name FROM customer),
      |dirty AS (
      |  SELECT c_custkey + 1000000 AS id,
      |    CASE
      |      WHEN c_custkey % 30 = 1
      |        THEN substr(c_name, 1, length(c_name) - 1)
      |      WHEN c_custkey % 3 = 0
      |        THEN substr(c_name, 1, 5) || 'X' || substr(c_name, 7)
      |      WHEN c_custkey % 3 = 1
      |        THEN substr(c_name, 1, 5) || substr(c_name, 7)
      |      ELSE c_name END AS name
      |  FROM customer)""".stripMargin

  /** Deletion-neighborhood key CTEs only (ck/dk) — shared with the
    * capped-blocking oracle in R35Queries, which filters the keys
    * before joining.
    */
  private[queries] val erKeyCtes: String =
    """ck AS (
      |  SELECT id, name, unnest(list_distinct(list_append(
      |    list_transform(generate_series(1, length(name)),
      |      i -> substr(name, 1, i - 1) || substr(name, i + 1, length(name))),
      |    name))) AS k
      |  FROM clean),
      |dk AS (
      |  SELECT id, name, unnest(list_distinct(list_append(
      |    list_transform(generate_series(1, length(name)),
      |      i -> substr(name, 1, i - 1) || substr(name, i + 1, length(name))),
      |    name))) AS k
      |  FROM dirty)""".stripMargin

  /** Deletion-neighborhood keys + verified radius-1 pairs, DuckDB side
    * (the EntityResolution.verifiedPairs mirror).
    */
  private[queries] val erPairCtes: String =
    erKeyCtes + """,
      |cand AS (
      |  SELECT DISTINCT d.id AS dirty_id, d.name AS dn,
      |                  c.id AS clean_id, c.name AS cn
      |  FROM dk d JOIN ck c USING (k)),
      |ver AS (
      |  SELECT dirty_id, clean_id,
      |    CAST(levenshtein(dn, cn) AS BIGINT) AS dist
      |  FROM cand WHERE levenshtein(dn, cn) <= 1)""".stripMargin

  /** Best-edge → recursive-reachability clustering over [[erPairCtes]]'
    * `ver` pairs, ending in `lab(id, cluster)` with singletons kept —
    * shared by er_cluster and er_golden (requires WITH RECURSIVE).
    */
  private[queries] val erClusterCtes: String =
    """best AS (
      |  SELECT dirty_id, clean_id FROM (
      |    SELECT dirty_id, clean_id,
      |      row_number() OVER (PARTITION BY dirty_id
      |        ORDER BY dist, clean_id) AS rn
      |    FROM ver)
      |  WHERE rn = 1),
      |edges AS (
      |  SELECT dirty_id AS src, clean_id AS dst FROM best
      |  UNION SELECT clean_id, dirty_id FROM best),
      |reach AS (
      |  SELECT src AS id, src AS lab FROM edges
      |  UNION
      |  SELECT e.dst AS id, r.lab FROM reach r
      |  JOIN edges e ON e.src = r.id),
      |cc AS (SELECT id, min(lab) AS cluster FROM reach GROUP BY id),
      |allv AS (
      |  SELECT id FROM clean UNION ALL SELECT id FROM dirty),
      |lab AS (
      |  SELECT v.id, coalesce(cc.cluster, v.id) AS cluster
      |  FROM allv v LEFT JOIN cc ON cc.id = v.id)""".stripMargin

  private[queries] def dirtyCustomers(s: org.apache.spark.sql.SparkSession,
                             d: String): org.apache.spark.sql.DataFrame =
    Tables.customer(s, d).select(
      (col("c_custkey") + 1000000L).as("id"),
      when(col("c_custkey") % 30 === 1,
        expr("substr(c_name, 1, length(c_name) - 1)"))
        .when(col("c_custkey") % 3 === 0,
          concat(expr("substr(c_name, 1, 5)"), lit("X"),
            expr("substr(c_name, 7)")))
        .when(col("c_custkey") % 3 === 1,
          concat(expr("substr(c_name, 1, 5)"), expr("substr(c_name, 7)")))
        .otherwise(col("c_name")).as("name"))

  private[queries] def cleanCustomers(s: org.apache.spark.sql.SparkSession,
                             d: String): org.apache.spark.sql.DataFrame =
    Tables.customer(s, d)
      .select(col("c_custkey").as("id"), col("c_name").as("name"))

  /** The perceptron fixture: ±1 label (lang='en') and integer count
    * features over documents — shared by train and eval.
    */
  private[queries] def perceptronDocs(s: org.apache.spark.sql.SparkSession,
                             d: String): org.apache.spark.sql.DataFrame =
    Tables.documents(s, d).select(
      when(col("lang") === "en", 1L).otherwise(-1L).as("y"),
      graft.ops.TextAnalysis.tokenCountWs(col("text")).as("toks"),
      length(col("text")).cast("long").as("chars"),
      length(regexp_replace(col("text"), "[A-Za-z0-9\\s]", ""))
        .cast("long").as("punct"))

  /** DuckDB mirror of [[perceptronDocs]] + three unrolled training
    * epochs: CTEs f (features), w0 (zero model), and m1/w1 … m3/w3
    * (per-epoch misclassified sums and updated weights) — shared by the
    * ml_perceptron and ml_perceptron_eval oracles so training can never
    * drift between them.
    */
  private[queries] val perceptronCtes: String = {
    val epochs = (1 to 3).map { e =>
      s"""m$e AS (
         |  SELECT count(*) AS n,
         |    CAST(coalesce(sum(CASE WHEN y * (w.b + w.wt * toks +
         |      w.wc * chars + w.wp * punct) <= 0 THEN 1 END), 0)
         |      AS BIGINT) AS m,
         |    CAST(coalesce(sum(CASE WHEN y * (w.b + w.wt * toks +
         |      w.wc * chars + w.wp * punct) <= 0 THEN y END), 0)
         |      AS BIGINT) AS db,
         |    CAST(coalesce(sum(CASE WHEN y * (w.b + w.wt * toks +
         |      w.wc * chars + w.wp * punct) <= 0 THEN y * toks END), 0)
         |      AS BIGINT) AS dt,
         |    CAST(coalesce(sum(CASE WHEN y * (w.b + w.wt * toks +
         |      w.wc * chars + w.wp * punct) <= 0 THEN y * chars END), 0)
         |      AS BIGINT) AS dc,
         |    CAST(coalesce(sum(CASE WHEN y * (w.b + w.wt * toks +
         |      w.wc * chars + w.wp * punct) <= 0 THEN y * punct END), 0)
         |      AS BIGINT) AS dp
         |  FROM f, w${e - 1} w),
         |w$e AS (
         |  SELECT w.b + m.db AS b, w.wt + m.dt AS wt,
         |         w.wc + m.dc AS wc, w.wp + m.dp AS wp
         |  FROM w${e - 1} w, m$e m)""".stripMargin
    }.mkString(",\n")
    s"""f AS (
       |  SELECT CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y,
       |    CAST(CASE WHEN trim(text) = '' THEN 0
       |      ELSE len(string_split_regex(trim(text), '\\s+'))
       |      END AS BIGINT) AS toks,
       |    CAST(length(text) AS BIGINT) AS chars,
       |    CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
       |      AS BIGINT) AS punct
       |  FROM documents),
       |w0 AS (SELECT CAST(0 AS BIGINT) AS b, CAST(0 AS BIGINT) AS wt,
       |              CAST(0 AS BIGINT) AS wc, CAST(0 AS BIGINT) AS wp),
       |$epochs""".stripMargin
  }

  /** Shared oracle texts for the event family — referenced both by the
    * standalone queries and by the ev_pipeline flagship's UNION, so the
    * flagship can never drift from the operators it composes.
    */
  private[queries] val transitionsOracle: String =
    """WITH seq AS (
      |  SELECT event_type AS from_type,
      |    lead(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS to_type
      |  FROM events),
      |tc AS (
      |  SELECT from_type, to_type, count(*) AS n
      |  FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2)
      |SELECT from_type, to_type, n,
      |  cast(n AS DOUBLE) /
      |    cast(sum(n) OVER (PARTITION BY from_type) AS DOUBLE) AS p
      |FROM tc
      |ORDER BY from_type, to_type""".stripMargin

  private[queries] val attributionOracle: String =
    """WITH attr AS (
      |  SELECT event_type, value,
      |    coalesce(last_value(CASE WHEN event_type IN
      |        ('click', 'view', 'signup') THEN event_type END
      |        IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |      '(direct)') AS channel
      |  FROM events)
      |SELECT channel, count(*) AS n_conversions,
      |  cast(sum(cast(value AS DECIMAL(28,8))) AS DOUBLE) AS revenue
      |FROM attr
      |WHERE event_type = 'purchase'
      |GROUP BY channel
      |ORDER BY channel""".stripMargin

  /** The incremental-view fixture, defined ONCE for inc_agg and
    * inc_agg_asof: orders split into three batches by o_orderkey % 3,
    * each batch's per-status partials written + committed under the
    * shared path. Idempotent (writeBatch overwrites exactly its own
    * subtree), so either query can run first or both can rebuild.
    */
  private def writeIncAggBatches(s: org.apache.spark.sql.SparkSession,
                                 d: String): String = {
    val orders = Tables.orders(s, d)
    val path = sys.props.getOrElse("java.io.tmpdir", "/tmp") +
      "/graft_incagg_" + d.replaceAll("[^A-Za-z0-9.]", "_")
    (0L to 2L).foreach { b =>
      IncrementalAgg.writeBatch(
        IncrementalAgg.partials(
          orders.filter(col("o_orderkey") % 3 === b),
          "o_orderstatus", "o_totalprice"),
        path, b)
    }
    path
  }

  val all: Seq[Q] = Seq(

    Q("er_blocked",
      "Entity resolution (record linkage): a dirty record set — " +
        "mid-name substitutions/deletions, a truncation slice, exact " +
        "re-keys of the customer registry — resolved to its clean " +
        "entity via " +
        "FastSS deletion-neighborhood blocking (every string emits " +
        "itself + each single-char deletion; radius-1 pairs PROVABLY " +
        "share a key, so candidate generation is exact, never a cross " +
        "join), levenshtein<=1 verification, and a best-match aggregate " +
        "(min (dist, id) struct — no window). ~L+1 short keys per " +
        "record, one key equi-join, per-key fan-out bounded by actual " +
        "near-duplicate density.",
      (s, d) => EntityResolution.bestMatch(
        dirtyCustomers(s, d).withColumnRenamed("id", "dirty_id"), "dirty_id",
        cleanCustomers(s, d).withColumnRenamed("id", "clean_id"), "clean_id",
        "name"),
      Some(s"""WITH $erSourceCtes,
              |$erPairCtes,
              |best AS (
              |  SELECT dirty_id, clean_id, dist,
              |    row_number() OVER (PARTITION BY dirty_id
              |      ORDER BY dist, clean_id) AS rn
              |  FROM ver)
              |SELECT dirty_id, clean_id, dist FROM best WHERE rn = 1
              |ORDER BY dirty_id""".stripMargin)),

    Q("er_cluster",
      "Entity clustering, RESOLVE-THEN-GROUP: each dirty record " +
        "contributes its single best-match edge (with identifier-like " +
        "names every one-digit neighbor is a legitimate distance-1 " +
        "pair — clustering ALL verified edges chains unrelated " +
        "entities into mega-components, the false-merge failure mode " +
        "golden-record grouping exists to avoid), then connected " +
        "components groups records around their resolved entity, " +
        "unmatched records kept as singletons. A cluster is one clean " +
        "entity plus everything resolved to it — never two clean " +
        "entities merged. Oracle: recursive-CTE reachability over the " +
        "same best-edge list.",
      (s, d) => EntityResolution.clusters(
        dirtyCustomers(s, d).withColumnRenamed("id", "dirty_id"), "dirty_id",
        cleanCustomers(s, d).withColumnRenamed("id", "clean_id"), "clean_id",
        "name"),
      Some(s"""WITH RECURSIVE $erSourceCtes,
              |$erPairCtes,
              |$erClusterCtes
              |SELECT id, cluster,
              |  count(*) OVER (PARTITION BY cluster) AS cluster_size
              |FROM lab ORDER BY id""".stripMargin)),

    Q("doc_length_buckets",
      "Length-grouped batching (dynamic batching): docs bucket by " +
        "token-count tier (edges 64/128/256/512), batch within " +
        "(bucket, shard) in id order — 8 hash shards per tier so no " +
        "bucket funnels through one partition, each worker batching " +
        "its shard locally exactly like a distributed training loader " +
        "— and the report prices the padding: per batch the padded " +
        "cost is max_tokens x rows, waste = padded - real. All-integer " +
        "arithmetic; the only double is a division of exact longs.",
      (s, d) => Curation.lengthBuckets(Tables.documents(s, d),
        "doc_id", "text", bounds = Seq(64L, 128L, 256L, 512L),
        batchSize = 32, nShards = 8),
      Some("""WITH t AS (
             |  SELECT doc_id,
             |    CASE WHEN trim(text) = '' THEN 0
             |         ELSE len(string_split_regex(trim(text), '\s+'))
             |    END AS n_tokens
             |  FROM documents),
             |b AS (
             |  SELECT doc_id, n_tokens,
             |    CAST((CASE WHEN n_tokens >= 64 THEN 1 ELSE 0 END) +
             |         (CASE WHEN n_tokens >= 128 THEN 1 ELSE 0 END) +
             |         (CASE WHEN n_tokens >= 256 THEN 1 ELSE 0 END) +
             |         (CASE WHEN n_tokens >= 512 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS bucket,
             |    doc_id % 8 AS shard
             |  FROM t),
             |r AS (
             |  SELECT bucket, shard, n_tokens,
             |    CAST((row_number() OVER (PARTITION BY bucket, shard
             |      ORDER BY doc_id) - 1) // 32 AS BIGINT) AS batch
             |  FROM b),
             |pb AS (
             |  SELECT bucket, shard, batch, count(*) AS nd,
             |    max(n_tokens) AS mx, sum(n_tokens) AS st
             |  FROM r GROUP BY 1, 2, 3)
             |SELECT bucket, CAST(sum(nd) AS BIGINT) AS n_docs,
             |  count(*) AS n_batches,
             |  CAST(sum(st) AS BIGINT) AS sum_tokens,
             |  CAST(sum(mx * nd) AS BIGINT) AS padded_tokens,
             |  CASE WHEN sum(mx * nd) > 0
             |    THEN CAST(sum(mx * nd) - sum(st) AS DOUBLE) /
             |         CAST(sum(mx * nd) AS BIGINT)
             |    ELSE 0.0 END AS waste_frac
             |FROM pb GROUP BY bucket ORDER BY bucket""".stripMargin)),

    Q("dq_outliers",
      "Per-group z-score outlier gate over event values: one " +
        "aggregation pass collects each type's (n, sum, sum-of-squares) " +
        "through exact decimals, the 5-row stats broadcast back, and " +
        "rows flag when |v - mean| > 3 sigma — the anomaly gate a " +
        "pipeline trips before accepting a batch. Mean and sigma derive " +
        "from exact sums so the flags are bit-identical cross-engine; " +
        "one narrow agg + one broadcast join, nothing crosses an " +
        "exchange twice.",
      (s, d) => Profile.outlierGate(Tables.events(s, d),
        "event_type", "value", z = 3.0),
      Some("""WITH st AS (
             |  SELECT event_type, count(*) AS n,
             |    cast(sum(cast(value AS DECIMAL(28,8))) AS DOUBLE) AS s,
             |    cast(sum(cast(value * value AS DECIMAL(28,8))) AS DOUBLE)
             |      AS s2
             |  FROM events GROUP BY 1),
             |m AS (
             |  SELECT event_type, n, s / n AS mean,
             |    sqrt(greatest(s2 / n - (s / n) * (s / n), 0.0)) AS std
             |  FROM st)
             |SELECT e.event_type, m.n, m.mean, m.std,
             |  cast(sum(CASE WHEN abs(e.value - m.mean) > 3.0 * m.std
             |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
             |  cast(sum(CASE WHEN abs(e.value - m.mean) > 3.0 * m.std
             |    THEN 1 ELSE 0 END) AS DOUBLE) / m.n AS outlier_frac
             |FROM events e JOIN m USING (event_type)
             |GROUP BY e.event_type, m.n, m.mean, m.std
             |ORDER BY e.event_type""".stripMargin)),

    Q("inc_agg",
      "Incremental aggregate maintenance (the materialized-view refresh " +
        "shape): orders arrive in three batches, each contributing a " +
        "PARTIAL per-status aggregate (count, exact decimal sum, " +
        "min/max — all algebraically mergeable) persisted under the " +
        "shared commit-marker state machine; serving merges the " +
        "committed partials (keys x batches rows, the fact table is " +
        "never rescanned) and derives avg from the merged pair. " +
        "Because every partial is algebraic and the sum is exact " +
        "decimal, the merge is bit-identical to the full recompute the " +
        "oracle runs — per-refresh cost at 100 TB is O(new batch), not " +
        "O(history).",
      (s, d) => IncrementalAgg.serve(s, writeIncAggBatches(s, d),
          "o_orderstatus")
        .orderBy("o_orderstatus"),
      Some("""SELECT o_orderstatus, count(*) AS n,
             |  cast(sum(cast(o_totalprice AS DECIMAL(28,8))) AS DOUBLE)
             |    AS total,
             |  min(o_totalprice) AS min_v, max(o_totalprice) AS max_v,
             |  cast(sum(cast(o_totalprice AS DECIMAL(28,8))) AS DOUBLE)
             |    / count(*) AS avg_v
             |FROM orders
             |GROUP BY o_orderstatus
             |ORDER BY o_orderstatus""".stripMargin)),

    Q("sim_hamming",
      "Binary-embedding ANN: every vector's SIGN pattern packed into " +
        "two 32-bit words (1 bit per dimension — 32x smaller than " +
        "float32, the cheapest at-scale representation after PQ), " +
        "shortlist by Hamming distance (bit_count of XOR, pure register " +
        "arithmetic — sign-random-projection theory makes it a cosine " +
        "estimator), exact decimal cosine on the <= 50 survivors only. " +
        "Same skeleton as sim_quant: TakeOrderedAndProject shortlist, " +
        "broadcast 1-row query, codes-only arithmetic until the tail.",
      (s, d) => Similarity.hammingTopK(Tables.embeddings(s, d),
        "vec_id", "embedding", queryId = 0L, k = 10, rescore = 50),
      Some(s"""WITH ${hammingCtes(50)},
              |m AS (
              |  SELECT e.vec_id, e.embedding FROM embeddings e
              |  JOIN short s ON e.vec_id = s.vec_id),
              |ne AS (
              |  SELECT vec_id, sqrt(${dotSql("embedding", "embedding")}) AS nrm
              |  FROM m, generate_series(1, 64) g(i) GROUP BY vec_id),
              |dots AS (
              |  SELECT m.vec_id, ${dotSql("m.embedding", "q.qe")} AS dot
              |  FROM m, q, generate_series(1, 64) g(i) GROUP BY m.vec_id)
              |SELECT d.vec_id, s.hamming, d.dot / (ne.nrm * nq.nrm) AS cos_sim
              |FROM dots d JOIN ne ON d.vec_id = ne.vec_id
              |  JOIN short s ON d.vec_id = s.vec_id, nq
              |ORDER BY cos_sim DESC, d.vec_id LIMIT 10""".stripMargin)),

    Q("sim_recall_hamming",
      "Recall@10 gate for the binary sign-hash index: exact brute force " +
        "vs sign-pack -> Hamming shortlist(50) -> exact rescore -> " +
        "top-10, intersected — every index family ships with its gate. " +
        "A drop here means 64 sign bits are too coarse for the rescore " +
        "budget (the lever is `rescore`, not the representation).",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val q = Similarity.vectorOf(emb, "vec_id", "embedding", 0L)
        val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 10)
        val approx = Similarity.hammingTopK(emb, "vec_id", "embedding",
          queryId = 0L, k = 10, rescore = 50)
        Similarity.recallAtK(exact, approx, "vec_id", 10)
      },
      Some(s"""WITH ${hammingCtes(50)},
              |ne AS (
              |  SELECT vec_id, sqrt(${dotSql("embedding", "embedding")}) AS nrm
              |  FROM embeddings, generate_series(1, 64) g(i) GROUP BY vec_id),
              |dots AS (
              |  SELECT e.vec_id, ${dotSql("e.embedding", "q.qe")} AS dot
              |  FROM embeddings e, q, generate_series(1, 64) g(i)
              |  GROUP BY e.vec_id),
              |exact AS (
              |  SELECT d.vec_id FROM dots d JOIN ne USING (vec_id), nq
              |  ORDER BY d.dot / (ne.nrm * nq.nrm) DESC, d.vec_id LIMIT 10),
              |approx AS (
              |  SELECT d.vec_id
              |  FROM dots d JOIN ne USING (vec_id) JOIN short s USING (vec_id), nq
              |  ORDER BY d.dot / (ne.nrm * nq.nrm) DESC, d.vec_id LIMIT 10)
              |SELECT CAST(10 AS BIGINT) AS k,
              |  count(*) AS hits,
              |  CASE WHEN (SELECT count(*) FROM exact) > 0
              |    THEN CAST(count(*) AS DOUBLE) /
              |         (SELECT count(*) FROM exact)
              |    ELSE 0.0 END AS recall
              |FROM approx JOIN exact USING (vec_id)""".stripMargin)),

    Q("ev_funnel_window",
      "The sequential funnel with a CONVERSION WINDOW — signup -> view " +
        "-> purchase where each stage must land within 1 hour of the " +
        "previous match (the 'convert within N' contract every funnel " +
        "product ships): same ONE user-key exchange and in-row greedy " +
        "fold as ev_funnel_n, the window test in exact integer " +
        "microseconds (unix_micros == the oracle's epoch_us, no " +
        "truncation drift). The oracle unrolls the min-ts join chain " +
        "with the same strict-after + within-window predicate — " +
        "equivalent because the greedy match IS the earliest " +
        "qualifying event.",
      (s, d) => graft.ops.Funnel.funnel(Tables.events(s, d),
        "user_id", "ts", "event_type",
        Seq("signup", "view", "purchase"), maxGapSeconds = Some(3600L)),
      Some("""WITH s1 AS (
             |  SELECT user_id, min(ts) AS t FROM events
             |  WHERE event_type = 'signup' GROUP BY 1),
             |s2 AS (
             |  SELECT e.user_id, min(e.ts) AS t
             |  FROM events e JOIN s1 USING (user_id)
             |  WHERE e.event_type = 'view' AND e.ts > s1.t
             |    AND epoch_us(e.ts) - epoch_us(s1.t) <= 3600000000
             |  GROUP BY 1),
             |s3 AS (
             |  SELECT e.user_id, min(e.ts) AS t
             |  FROM events e JOIN s2 USING (user_id)
             |  WHERE e.event_type = 'purchase' AND e.ts > s2.t
             |    AND epoch_us(e.ts) - epoch_us(s2.t) <= 3600000000
             |  GROUP BY 1)
             |SELECT * FROM (
             |  SELECT 1 AS stage_idx, 'signup' AS stage,
             |         (SELECT count(*) FROM s1) AS n_users
             |  UNION ALL SELECT 2, 'view', (SELECT count(*) FROM s2)
             |  UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3))
             |ORDER BY stage_idx""".stripMargin)),

    Q("ml_perceptron",
      "Distributed batch perceptron training with EXACT cross-engine " +
        "semantics: an integer-arithmetic linear classifier (label " +
        "lang='en' as +1/-1; features = whitespace tokens, chars, " +
        "punctuation count, bias) where each epoch is ONE narrow " +
        "aggregate — the margin carries the weights as literals, " +
        "misclassified-row update sums are map-side-combined integers, " +
        "the driver applies the k-length update (parameter-server-free " +
        "batch training, the k-means/CC loop discipline). No floats, " +
        "no seed, no schedule: the oracle replays the three unrolled " +
        "epochs in integer SQL bit-for-bit. The trainable seam a " +
        "learned quality filter (fastText-style) plugs into.",
      (s, d) => graft.ops.Perceptron.train(perceptronDocs(s, d),
        Seq("toks", "chars", "punct"), "y", epochs = 3),
      Some(
        s"""WITH $perceptronCtes
           |SELECT * FROM (
           |  SELECT CAST(1 AS BIGINT) AS epoch, m1.n, m1.m AS n_misclassified,
           |    w1.b AS w_bias, w1.wt AS w_toks, w1.wc AS w_chars,
           |    w1.wp AS w_punct FROM m1, w1
           |  UNION ALL SELECT 2, m2.n, m2.m, w2.b, w2.wt, w2.wc, w2.wp
           |    FROM m2, w2
           |  UNION ALL SELECT 3, m3.n, m3.m, w3.b, w3.wt, w3.wc, w3.wp
           |    FROM m3, w3)
           |ORDER BY epoch""".stripMargin)),

    Q("ml_perceptron_eval",
      "Train -> predict -> evaluate, end to end: the 3-epoch integer " +
        "perceptron's FINAL weights score every document (one scan, " +
        "weights as literals) into a confusion matrix + accuracy — the " +
        "classifier-evaluation report a learned quality filter ships " +
        "with. Predictions, counts and the accuracy ratio are all " +
        "derived from integer arithmetic, so the whole " +
        "train-then-evaluate chain replays bit-for-bit in the oracle's " +
        "unrolled SQL.",
      (s, d) => {
        val docs = perceptronDocs(s, d)
        val trained = graft.ops.Perceptron.train(docs,
          Seq("toks", "chars", "punct"), "y", epochs = 3)
          .collect().maxBy(_.getLong(0))
        graft.ops.Perceptron.evaluate(docs, Seq("toks", "chars", "punct"),
          "y", (3 to 6).map(trained.getLong))
      },
      Some(
        s"""WITH $perceptronCtes,
           |p AS (
           |  SELECT y, CASE WHEN (w.b + w.wt * toks + w.wc * chars +
           |    w.wp * punct) > 0 THEN 1 ELSE -1 END AS pred
           |  FROM f, w3 w),
           |cm AS (
           |  SELECT count(*) AS n,
           |    CAST(coalesce(sum(CASE WHEN y = 1 AND pred = 1
           |      THEN 1 END), 0) AS BIGINT) AS tp,
           |    CAST(coalesce(sum(CASE WHEN y = -1 AND pred = 1
           |      THEN 1 END), 0) AS BIGINT) AS fp,
           |    CAST(coalesce(sum(CASE WHEN y = 1 AND pred = -1
           |      THEN 1 END), 0) AS BIGINT) AS fn,
           |    CAST(coalesce(sum(CASE WHEN y = -1 AND pred = -1
           |      THEN 1 END), 0) AS BIGINT) AS tn
           |  FROM p)
           |SELECT n, tp, fp, fn, tn,
           |  CAST(tp + tn AS DOUBLE) / n AS accuracy
           |FROM cm""".stripMargin)),

    Q("inc_agg_asof",
      "TIME TRAVEL for the incremental view: after all three batches " +
        "commit, serve AS-OF batch 1 — only markers with id <= 1 " +
        "replay (monotone batch ids make that the true prefix of view " +
        "history, the same contract the index layouts' as-of uses), so " +
        "the reader sees the aggregate exactly as it stood after batch " +
        "1 committed. Oracle: the direct recompute over the first two " +
        "thirds of orders.",
      (s, d) => IncrementalAgg.serve(s, writeIncAggBatches(s, d),
          "o_orderstatus", asOf = Some(1L))
        .orderBy("o_orderstatus"),
      Some("""SELECT o_orderstatus, count(*) AS n,
             |  cast(sum(cast(o_totalprice AS DECIMAL(28,8))) AS DOUBLE)
             |    AS total,
             |  min(o_totalprice) AS min_v, max(o_totalprice) AS max_v,
             |  cast(sum(cast(o_totalprice AS DECIMAL(28,8))) AS DOUBLE)
             |    / count(*) AS avg_v
             |FROM orders
             |WHERE o_orderkey % 3 <= 1
             |GROUP BY o_orderstatus
             |ORDER BY o_orderstatus""".stripMargin)),

    Q("inc_distinct",
      "Incremental DISTINCT-count view via mergeable sketches: a " +
        "distinct count does not merge across batches, its HLL sketch " +
        "does — each of three event batches persists per-type " +
        "Datasketches HLL partials under the commit markers, serving " +
        "unions the committed sketches (keys x batches rows, facts " +
        "never rescanned for the estimate) and the output gates the " +
        "merged estimate against the exact count with the ev_sketch " +
        "bounded-error pattern: exact values hash-check cross-engine, " +
        "a broken merge fails the boolean, in-bound sketch wobble " +
        "does not.",
      (s, d) => {
        val ev = Tables.events(s, d)
        val path = sys.props.getOrElse("java.io.tmpdir", "/tmp") +
          "/graft_incdistinct_" + d.replaceAll("[^A-Za-z0-9.]", "_")
        (0L to 2L).foreach { b =>
          IncrementalAgg.writeBatch(
            IncrementalAgg.sketchPartials(
              ev.filter(col("event_id") % 3 === b), "event_type", "user_id"),
            path, b)
        }
        IncrementalAgg.serveDistinct(s, path, ev, "event_type", "user_id")
      },
      Some("""SELECT event_type,
             |  count(DISTINCT user_id) AS exact_distinct,
             |  true AS hll_within_tol
             |FROM events
             |GROUP BY event_type
             |ORDER BY event_type""".stripMargin)),

    Q("graph_pagerank",
      "PageRank over the near-dup similarity graph (MinHash candidate " +
        "pairs, symmetrized) — duplicate-cluster CENTRALITY: the " +
        "highest-rank member of a dup family is the canonical pick a " +
        "survivor policy wants, and hub scores flag template families. " +
        "Power iteration with the CC loop's scale shape: the edge list " +
        "pre-joins its out-degrees once and caches pre-partitioned on " +
        "the join key, so each of the 3 iterations shuffles only the " +
        "nodes-sized rank relation (one join + one partial-aggregated " +
        "sum). Incoming mass sums through DECIMAL(38,14), so every " +
        "iteration is bit-identical to the oracle's unrolled CTEs.",
      (s, d) => Graphs.pageRank(
        Dedup.minhashCandidates(Tables.documents(s, d), "doc_id", "text",
          Dedup.Shingler.words(5), bandsN = 2, rowsPerBand = 3),
        "id_a", "id_b", damping = 0.85, iters = 3),
      Some {
        val iterCtes = (1 to 3).map { i =>
          s"""c$i AS (
             |  SELECT e.dst AS id,
             |    cast(sum(cast(r.r / d.deg AS DECIMAL(38,14))) AS DOUBLE)
             |      AS s
             |  FROM edges e JOIN r${i - 1} r ON r.id = e.src
             |       JOIN deg d ON d.src = e.src
             |  GROUP BY e.dst),
             |r$i AS (
             |  SELECT id, 0.85::DOUBLE * s +
             |    (1.0::DOUBLE - 0.85::DOUBLE) / n AS r
             |  FROM c$i, nn)""".stripMargin
        }.mkString(",\n")
        s"""WITH ${ExtQueries.minhashPairCtes},
           |edges AS (
           |  SELECT id_a AS src, id_b AS dst FROM pairs
           |  UNION SELECT id_b, id_a FROM pairs),
           |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
           |nn AS (SELECT count(*) AS n FROM deg),
           |r0 AS (SELECT src AS id, 1.0::DOUBLE / n AS r FROM deg, nn),
           |$iterCtes
           |SELECT id, r AS pagerank FROM r3 ORDER BY id""".stripMargin
      }),

    Q("stream_inc_agg",
      "Structured Streaming maintains the incremental AGGREGATE the " +
        "same way it maintains the two index families: the historical " +
        "third of orders bootstraps batch 0, the file stream appends " +
        "each micro-batch's PARTIAL aggregate under the micro-batch id " +
        "(replay rewrites exactly its own subtree before re-marking — " +
        "exactly-once), and serving merges committed partials. " +
        "Stream == batch: the same full-recompute oracle as inc_agg.",
      (s, d) => {
        val path = graft.streaming.EventStream.runIncAggStream(s, d,
          sys.props.getOrElse("java.io.tmpdir", "/tmp") +
            "/graft_stream_incagg_" + d.replaceAll("[^A-Za-z0-9.]", "_"))
        IncrementalAgg.serve(s, path, "o_orderstatus")
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, count(*) AS n,
             |  cast(sum(cast(o_totalprice AS DECIMAL(28,8))) AS DOUBLE)
             |    AS total,
             |  min(o_totalprice) AS min_v, max(o_totalprice) AS max_v,
             |  cast(sum(cast(o_totalprice AS DECIMAL(28,8))) AS DOUBLE)
             |    / count(*) AS avg_v
             |FROM orders
             |GROUP BY o_orderstatus
             |ORDER BY o_orderstatus""".stripMargin)),

    Q("sim_recall_hamming_sweep",
      "Recall-vs-rescore-budget CURVE for the binary sign-hash index " +
        "in one pass — the scan-path analogue of sim_recall_sweep's " +
        "nprobe curve: the corpus is Hamming-ranked ONCE to " +
        "max(budgets), each operating point (10/25/50) is a rank " +
        "filter over that same bounded shortlist re-ranked by exact " +
        "cosine, and all points share one exact ground truth — the " +
        "curve that answers how much rescore 64 sign bits need, " +
        "which is exactly the lever sim_recall_hamming's gate names.",
      (s, d) => Similarity.hammingRecallSweep(Tables.embeddings(s, d),
        "vec_id", "embedding", queryId = 0L, k = 10,
        budgets = Seq(10, 25, 50)),
      Some(s"""WITH ${hammingCtes(50)},
              |ranked AS (
              |  SELECT vec_id, hamming,
              |    row_number() OVER (ORDER BY hamming, vec_id) AS rank
              |  FROM short),
              |ne AS (
              |  SELECT vec_id, sqrt(${dotSql("embedding", "embedding")}) AS nrm
              |  FROM embeddings, generate_series(1, 64) g(i) GROUP BY vec_id),
              |dots AS (
              |  SELECT e.vec_id, ${dotSql("e.embedding", "q.qe")} AS dot
              |  FROM embeddings e, q, generate_series(1, 64) g(i)
              |  GROUP BY e.vec_id),
              |pts AS (SELECT unnest([10, 25, 50]) AS budget),
              |exact AS (
              |  SELECT d.vec_id FROM dots d JOIN ne USING (vec_id), nq
              |  ORDER BY d.dot / (ne.nrm * nq.nrm) DESC, d.vec_id LIMIT 10),
              |per AS (
              |  SELECT budget, vec_id FROM (
              |    SELECT p.budget, r.vec_id,
              |      row_number() OVER (PARTITION BY p.budget
              |        ORDER BY d.dot / (ne.nrm * nq.nrm) DESC, r.vec_id)
              |        AS crn
              |    FROM ranked r JOIN dots d USING (vec_id)
              |         JOIN ne USING (vec_id), nq, pts p
              |    WHERE r.rank <= p.budget)
              |  WHERE crn <= 10),
              |hits AS (
              |  SELECT budget, count(*) AS h
              |  FROM per JOIN exact USING (vec_id) GROUP BY budget),
              |den AS (SELECT count(*) AS n FROM exact)
              |SELECT CAST(p.budget AS BIGINT) AS budget,
              |  CAST(10 AS BIGINT) AS k,
              |  coalesce(h.h, 0) AS hits,
              |  CASE WHEN den.n > 0
              |    THEN CAST(coalesce(h.h, 0) AS DOUBLE) / den.n
              |    ELSE 0.0 END AS recall
              |FROM pts p LEFT JOIN hits h ON h.budget = p.budget, den
              |ORDER BY p.budget""".stripMargin)),

    Q("ev_pipeline",
      "The event-analytics flagship — sessionization, the 5-stage " +
        "funnel, last-touch attribution, cohort retention and the " +
        "transition matrix composed into ONE KPI report (long format: " +
        "metric, k1, k2, n, v), the product-analytics counterpart of " +
        "pretrain_pipeline. Each branch is the already-verified " +
        "operator (same code paths), reshaped and unioned lazily — " +
        "Spark runs the five branches as one query. The oracle UNIONs " +
        "the very oracle texts of the standalone queries (shared " +
        "string constants, subquery-wrapped), so the flagship can " +
        "never drift from the operators it composes.",
      (s, d) => {
        val ev = Tables.events(s, d)
        import org.apache.spark.sql.Column
        def shape(metric: String, k1: Column, k2: Column, n: Column,
                  v: Column)(df: org.apache.spark.sql.DataFrame) =
          df.select(lit(metric).as("metric"), k1.cast("string").as("k1"),
            k2.cast("string").as("k2"), n.cast("long").as("n"),
            v.cast("double").as("v"))
        val sessions = shape("sessions", lit(""), lit(""), col("__c"),
          col("__e").cast("double") / col("__c"))(
          EventOps.sessionize(ev, "user_id", "ts", "value")
            .agg(count(lit(1)).as("__c"), sum(col("n_events")).as("__e")))
        val funnel = shape("funnel", col("stage"), col("stage_idx"),
          col("n_users"), lit(0.0))(
          graft.ops.Funnel.funnel(ev, "user_id", "ts", "event_type",
            Seq("signup", "view", "click", "view", "purchase")))
        val attrib = shape("attribution", col("channel"), lit(""),
          col("n_conversions"), col("revenue"))(
          EventOps.lastTouchAttribution(ev, "user_id", "ts", "event_type",
            "event_id", Seq("click", "view", "signup"), "purchase", "value"))
        val retention = shape("retention", col("cohort_week"),
          col("active_week"), col("n_users"), lit(0.0))(
          EventOps.cohortRetention(ev, "user_id", "ts", "event_type",
            cohortType = "signup"))
        val transitions = shape("transition", col("from_type"),
          col("to_type"), col("n"), col("p"))(
          EventOps.transitions(ev, "user_id", "ts", "event_type",
            "event_id"))
        sessions.unionByName(funnel).unionByName(attrib)
          .unionByName(retention).unionByName(transitions)
          .orderBy(col("metric"), col("k1"), col("k2"))
      },
      Some {
        // wrap each standalone oracle as a subquery; the funnel and
        // retention texts live beside their own queries and are pulled
        // from the registry objects so they stay single-sourced
        val funnelO = R9Queries.all.find(_.name == "ev_funnel_n").get
          .oracle.get
        val retentionO = R8Queries.all.find(_.name == "ev_retention").get
          .oracle.get
        val sessionsO = ExtQueries.all.find(_.name == "ev_sessionize").get
          .oracle.get
        s"""SELECT * FROM (
           |SELECT 'sessions' AS metric, '' AS k1, '' AS k2,
           |  count(*) AS n,
           |  cast(sum(n_events) AS DOUBLE) / count(*) AS v
           |FROM ($sessionsO)
           |UNION ALL
           |SELECT 'funnel', stage, CAST(stage_idx AS VARCHAR), n_users, 0.0
           |FROM ($funnelO)
           |UNION ALL
           |SELECT 'attribution', channel, '', n_conversions, revenue
           |FROM ($attributionOracle)
           |UNION ALL
           |SELECT 'retention', cohort_week, active_week, n_users, 0.0
           |FROM ($retentionO)
           |UNION ALL
           |SELECT 'transition', from_type, to_type, n, p
           |FROM ($transitionsOracle)
           |) ORDER BY metric, k1, k2""".stripMargin
      }),

    Q("ev_rfm",
      "RFM customer scoring (recency / frequency / monetary quintiles, " +
        "5 = best) — the CRM segmentation backbone. The classic " +
        "ntile(5) would global-sort the user relation through one " +
        "partition; here the quintile boundaries come from ONE exact " +
        "percentile aggregate (the q21 percentile == quantile_cont " +
        "cross-engine equivalence) broadcast back, and every user " +
        "scores by threshold comparison at scan stage — no global " +
        "sort at any size.",
      (s, d) => EventOps.rfm(Tables.events(s, d), "user_id", "ts",
        "event_type", conversionType = "purchase", valueCol = "value"),
      Some {
        def q(v: String, t: String): String =
          "(1 + " + (1 to 4).map(i =>
            s"(CASE WHEN $v > $t[$i] THEN 1 ELSE 0 END)").mkString(" + ") + ")"
        s"""WITH conv AS (
           |  SELECT * FROM events WHERE event_type = 'purchase'),
           |d1 AS (SELECT max(ts::DATE) AS d1 FROM conv),
           |per AS (
           |  SELECT user_id,
           |    CAST(datediff('day', max(ts::DATE), (SELECT d1 FROM d1))
           |      AS BIGINT) AS recency_days,
           |    count(*) AS frequency,
           |    cast(sum(cast(value AS DECIMAL(28,8))) AS DOUBLE) AS monetary
           |  FROM conv GROUP BY user_id),
           |th AS (
           |  SELECT quantile_cont(recency_days, [0.2, 0.4, 0.6, 0.8]) AS tr,
           |         quantile_cont(frequency, [0.2, 0.4, 0.6, 0.8]) AS tf,
           |         quantile_cont(monetary, [0.2, 0.4, 0.6, 0.8]) AS tm
           |  FROM per)
           |SELECT user_id, recency_days, frequency, monetary,
           |  CAST(6 - ${q("recency_days::DOUBLE", "tr")} AS BIGINT)
           |    AS r_score,
           |  CAST(${q("frequency::DOUBLE", "tf")} AS BIGINT) AS f_score,
           |  CAST(${q("monetary", "tm")} AS BIGINT) AS m_score
           |FROM per, th
           |ORDER BY user_id""".stripMargin
      }),

    Q("ev_transitions",
      "Markov next-event transition matrix: adjacent event pairs per " +
        "user (ordered by (ts, event_id) so equal timestamps are " +
        "deterministic), counted into the |types| x |types| matrix with " +
        "per-source transition probabilities — the navigation-flow / " +
        "behavioral-model input. ONE user-keyed exchange for the lead " +
        "window; the (from, to) aggregate map-side-combines every " +
        "partition to <= 25 rows before the second (trivial) exchange; " +
        "the probability normalization is a window over the bounded " +
        "matrix itself.",
      (s, d) => EventOps.transitions(Tables.events(s, d),
        "user_id", "ts", "event_type", "event_id"),
      Some(transitionsOracle)),

    Q("ev_attribution",
      "Last-touch conversion attribution: every purchase credits the " +
        "most recent strictly-preceding touch event (click/view/signup) " +
        "of its user, or the '(direct)' sentinel when none precedes it; " +
        "revenue sums through exact decimal so channel totals are " +
        "order-independent. The carry-forward is last(..ignoreNulls) " +
        "over a user-keyed frame ending at the PREVIOUS row — strict " +
        "precedence holds even under equal timestamps because only rows " +
        "physically before the conversion (by the (ts, event_id) sort) " +
        "are in frame. One user exchange + a |channels|-row rollup.",
      (s, d) => EventOps.lastTouchAttribution(Tables.events(s, d),
        "user_id", "ts", "event_type", "event_id",
        touchTypes = Seq("click", "view", "signup"),
        conversionType = "purchase", valueCol = "value"),
      Some(attributionOracle)),

    Q("ev_gapfill",
      "Dense daily time series for a bounded watchlist (users with " +
        "user_id % 50 = 1): purchase counts per (user, day) over the " +
        "full observation window, ZERO-FILLED on empty days, with " +
        "last-observation-carried-forward daily revenue — the gap-fill " +
        "+ LOCF pass every dashboard and feature-store export needs. " +
        "The day spine is a 1-row min/max aggregate exploded and " +
        "broadcast; the users x days grid is bounded by construction; " +
        "the sparse facts aggregate once on (user, day) and left-join " +
        "the grid; LOCF is a window over the bounded grid.",
      (s, d) => {
        val ev = Tables.events(s, d)
        val sel = ev.filter(col("user_id") % 50 === 1 &&
          col("event_type") === "purchase")
        EventOps.gapFillDaily(sel, ev, "user_id", "ts", "value")
      },
      Some("""WITH bounds AS (
             |  SELECT min(ts::DATE) AS d0, max(ts::DATE) AS d1 FROM events),
             |days AS (
             |  SELECT unnest(generate_series(d0::TIMESTAMP, d1::TIMESTAMP,
             |    INTERVAL 1 DAY))::DATE AS day
             |  FROM bounds),
             |sel AS (
             |  SELECT * FROM events
             |  WHERE user_id % 50 = 1 AND event_type = 'purchase'),
             |users AS (SELECT DISTINCT user_id FROM sel),
             |daily AS (
             |  SELECT user_id, ts::DATE AS day, count(*) AS n,
             |    cast(sum(cast(value AS DECIMAL(28,8))) AS DOUBLE) AS rev
             |  FROM sel GROUP BY 1, 2),
             |grid AS (
             |  SELECT u.user_id, d.day FROM users u CROSS JOIN days d)
             |SELECT g.user_id, strftime(g.day, '%Y-%m-%d') AS day,
             |  coalesce(dy.n, 0) AS n_events,
             |  coalesce(last_value(dy.rev IGNORE NULLS)
             |    OVER (PARTITION BY g.user_id ORDER BY g.day
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             |    0.0::DOUBLE) AS rev_locf
             |FROM grid g
             |LEFT JOIN daily dy ON dy.user_id = g.user_id AND dy.day = g.day
             |ORDER BY g.user_id, g.day""".stripMargin))
  )
}
