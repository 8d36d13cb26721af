package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{Curation, Dedup, EventOps, RuntimeFilters, Similarity}
import graft.queries.OracleCompat.dsum

/** Round-9 session-3 additions: explicit runtime-filter join reduction,
  * incremental connected components (the CC half of batch-incremental
  * dedup), greedy k-center diversity selection, priority sampling
  * (weighted sampling without replacement), EWMA trend smoothing, and
  * the Matryoshka dimension-truncation recall sweep.
  */
object R15Queries {

  private val KCenters = 4
  private val PrioK = 50
  private val MatDims = Seq(64, 32, 16)

  /** DuckDB restatement of the exact decimal dot over index i (1-based),
    * same text as R14's helper (each round file keeps its oracle
    * arithmetic local so the SQL a row hashes against is visible in one
    * place).
    */
  private def dotSql(a: String, b: String): String =
    s"cast(sum(cast($a[i]::DOUBLE * $b[i]::DOUBLE AS DECIMAL(38,14))) AS DOUBLE)"

  /** DuckDB restatement of Similarity.sqDistExact: per-element squared
    * difference staged through DECIMAL(38,14) (the double difference and
    * square are exact/IEEE-identical; the decimal rounding of each term
    * and the exact decimal sum make the total order-independent).
    */
  private def sqDistSql(a: String, b: String): String =
    s"""cast(sum(cast(($a[i]::DOUBLE - $b[i]::DOUBLE) *
       |  ($a[i]::DOUBLE - $b[i]::DOUBLE) AS DECIMAL(38,14))) AS DOUBLE)""".stripMargin

  /** Oracle CTE chain for the greedy k-center unroll: d1 = distances to
    * the min-id seed, then per round r: s_r = argmax of the running min
    * (ties to smallest id), d_r = least(previous, distance to s_r).
    */
  private def kCenterCtes: String = {
    val rounds = (2 to KCenters).map { r =>
      val prev = s"d${r - 1}"
      s"""s$r AS MATERIALIZED (
         |  SELECT id, dm FROM $prev ORDER BY dm DESC, id LIMIT 1),
         |v$r AS (SELECT e.v FROM e JOIN s$r ON e.id = s$r.id),
         |d$r AS MATERIALIZED (
         |  SELECT e.id, least($prev.dm, ${sqDistSql("e.v", "c.v")}) AS dm
         |  FROM e JOIN $prev USING (id), v$r c, generate_series(1, 64) g(i)
         |  GROUP BY e.id, $prev.dm)""".stripMargin
    }.mkString(",\n")
    s"""e AS MATERIALIZED (
       |  SELECT vec_id AS id, embedding AS v FROM embeddings),
       |c1 AS (SELECT min(id) AS cid FROM e),
       |v1 AS (SELECT e.v FROM e JOIN c1 ON e.id = c1.cid),
       |d1 AS MATERIALIZED (
       |  SELECT e.id, ${sqDistSql("e.v", "c.v")} AS dm
       |  FROM e, v1 c, generate_series(1, 64) g(i)
       |  GROUP BY e.id),
       |$rounds""".stripMargin
  }

  val all: Seq[Q] = Seq(

    Q("q29_bloom_join",
      "Explicit runtime-filter join reduction " +
        "(RuntimeFilters.bloomReducedJoin): a bloom filter built over " +
        "the filtered dim side's keys (distributed partial aggregation " +
        "— only the fixed-size filter reaches the driver) prunes the " +
        "fact side AT THE SCAN with a native codegen'd " +
        "BloomFilterMightContain before the exchange, so only " +
        "~(match_rate + fpp) of lineitem pays the shuffle; the exact " +
        "join then clears the false positives, making the result " +
        "EXACTLY the plain inner join — which is the oracle. The " +
        "explicit form of the optimizer's own runtime bloom filters, " +
        "for when the author knows the reduction pays (dim too big to " +
        "broadcast, key set a few MB of filter).",
      (s, d) => RuntimeFilters.bloomReducedJoin(
          Tables.lineitem(s, d)
            .select("l_orderkey", "l_quantity", "l_returnflag"),
          Tables.orders(s, d).filter(col("o_orderstatus") === "P")
            .select("o_orderkey"),
          "l_orderkey", "o_orderkey",
          expectedItems = 100000L, fpp = 0.01)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, count(*) AS n,
             |  cast(sum(cast(l_quantity AS DECIMAL(28,8))) AS DOUBLE)
             |    AS sum_qty
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |WHERE o_orderstatus = 'P'
             |GROUP BY 1
             |ORDER BY l_returnflag""".stripMargin)),

    Q("dedup_cluster_incremental",
      "Incremental connected components " +
        "(Dedup.incrementalComponents) — the CC half of " +
        "batch-incremental dedup: the standing assignment of the " +
        "historical corpus (docs with doc_id % 10 < 8) is folded with " +
        "ONLY the candidate edges touching the new batch, as star " +
        "edges (id → component min id, diameter 2) plus new pairs — " +
        "input nodes-sized + new-batch-sized, never " +
        "history-pairs-sized, rounds tracking the NEW edges' diameter. " +
        "The oracle recomputes the FULL-corpus CC from scratch " +
        "(dedup_cluster's recursive CTE), so the row hash-checks the " +
        "central incremental-maintenance claim: fold(prev, new) ≡ " +
        "full rebuild, bit-for-bit. Candidate recovery against " +
        "100 TB of history is the band index at rest (dedup_index); " +
        "this row gates the merge step it feeds.",
      (s, d) => {
        val docs = Tables.documents(s, d)
        // ONE shingle+md5+min-agg signature pass for both fold sides
        // (optimization guide §1.2 "don't compute things twice"): a
        // doc's signature is a pure per-doc function of its text, so
        // sig(docs).filter(hist) ≡ sig(docs.filter(hist)) — only the
        // band-frequency window is corpus-dependent, and
        // minhashCandidatesFromSig recomputes that per side exactly as
        // two independent minhashCandidates calls did. r17: the sig
        // pass dominated this operator's map cost (it ran twice).
        val sig = Dedup.minhashSignatures(docs, "doc_id", "text",
          Dedup.Shingler.words(5), numHashes = 6)
        val prev = Dedup.connectedComponents(
          Dedup.minhashCandidatesFromSig(
            sig.filter(col("doc_id") % 10 < 8), "doc_id",
            bandsN = 2, rowsPerBand = 3),
          "id_a", "id_b")
        val newPairs = Dedup.minhashCandidatesFromSig(sig, "doc_id",
            bandsN = 2, rowsPerBand = 3)
          .filter(col("id_a") % 10 >= 8 || col("id_b") % 10 >= 8)
        Dedup.incrementalComponents(prev, newPairs, "id_a", "id_b")
          .select(col("id"), col("label").as("cluster"))
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
           |  SELECT e.dst AS id, r.lab FROM reach r
           |  JOIN edges e ON e.src = r.id)
           |SELECT id, min(lab) AS cluster FROM reach
           |GROUP BY id ORDER BY id""".stripMargin)),

    Q("doc_kcenter",
      "Greedy k-center diversity selection (Gonzalez 1985, the " +
        "2-approximation) over the embedding table " +
        "(Similarity.kCenterSelect): seed at the smallest id, then " +
        "k−1 rounds of 'add the point farthest from every chosen " +
        "center' — the coreset/curation primitive that picks maximally " +
        "SPREAD exemplars (annotation batches, eval seeds, " +
        "coverage-balanced mixes), the geometric complement of " +
        "hard-negative mining. Each round is ONE narrow " +
        "decimal-exact-distance map against the single newest center " +
        "plus a TakeOrdered(1) argmax over the running min — k scans " +
        "total, state localCheckpoint'ed, nothing corpus-sized ever " +
        "collected. Fully deterministic (exact decimal L2, ties to " +
        "smallest id), so the oracle unrolls the identical selection " +
        "rounds and the row hashes (round, center_id, radius) exactly.",
      (s, d) => Similarity.kCenterSelect(Tables.embeddings(s, d),
        "vec_id", "embedding", k = KCenters),
      Some {
        val tail = (2 to KCenters).map { r =>
          s"SELECT CAST($r AS BIGINT) AS round, id AS center_id, " +
            s"dm AS radius FROM s$r"
        }.mkString("\nUNION ALL ")
        s"""WITH $kCenterCtes
           |SELECT CAST(1 AS BIGINT) AS round, cid AS center_id,
           |  0.0::DOUBLE AS radius FROM c1
           |UNION ALL $tail
           |ORDER BY round""".stripMargin
      }),

    Q("doc_priority_sample",
      "Weighted sampling WITHOUT replacement by priority sampling " +
        "(Duffield, Lund & Thorup, JACM 2007) " +
        "(Curation.prioritySample): priority = weight / u with u a " +
        "deterministic md5-derived uniform in (0,1], the top 50 " +
        "priorities are the sample, and τ = the 51st priority yields " +
        "the unbiased subset-sum estimator ŵ = max(w, τ). Chosen over " +
        "Efraimidis–Spirakis deliberately: the priority is ONE IEEE " +
        "division of exactly-representable doubles — bit-identical " +
        "across engines, so priority AND estimator are hash-visible — " +
        "where u^(1/w) would ride a libm pow ulp. Plan: one narrow " +
        "scan, TakeOrdered(k+1), finishing steps on the k-bounded " +
        "relation; the length-weighted sample a token-budgeted " +
        "curation mix draws.",
      (s, d) => Curation.prioritySample(
          Tables.documents(s, d).select("doc_id", "lang", "n_chars"),
          "doc_id", col("n_chars"), k = PrioK)
        .select("doc_id", "lang", "weight", "priority", "est_weight")
        .orderBy("doc_id"),
      Some(s"""WITH p AS (
              |  SELECT doc_id, lang, CAST(n_chars AS DOUBLE) AS weight,
              |    CAST(n_chars AS DOUBLE) /
              |      ((('0x' || substring(md5(doc_id::VARCHAR), 1, 8))::BIGINT
              |        + 1) / 4294967296.0) AS priority
              |  FROM documents),
              |r AS (
              |  SELECT *, row_number() OVER (ORDER BY priority DESC, doc_id)
              |    AS rn
              |  FROM p),
              |tau AS (
              |  SELECT min(CASE WHEN rn = ${PrioK + 1} THEN priority END)
              |    AS t
              |  FROM r)
              |SELECT doc_id, lang, weight, priority,
              |  greatest(weight, coalesce(t, 0.0)) AS est_weight
              |FROM r, tau WHERE rn <= $PrioK
              |ORDER BY doc_id""".stripMargin)),

    Q("ev_ewma",
      "EWMA smoothing of the per-type daily count series " +
        "(EventOps.ewmaDaily) — the drifting-baseline trend every " +
        "metrics store draws next to the raw series (and the " +
        "complement to ev_anomaly's global z-score, which flags every " +
        "point of a trending series). α is FIXED at 1/2 so the " +
        "2^(k−1)-scaled recursion becomes an INTEGER cumulative sum " +
        "S_k = n_1 + Σ n_j·2^(j−2) carried in exact DECIMAL(38,0) " +
        "arithmetic, finished by one correctly-rounded decimal→double " +
        "cast and an exact power-of-two division — bit-identical " +
        "across engines (a decimal-staged n·2^-i term sum is NOT: its " +
        "terminating binary fractions land exactly on 14-dp half-ties " +
        "where Spark rounds HALF_UP and DuckDB HALF_EVEN). " +
        "Corpus-sized work is ONE daily aggregate; the smoothing is a " +
        "single key-partitioned window pass over the clock-bounded " +
        "daily relation, where the recursive form would serialize and " +
        "a closed-form expansion would self-join days².",
      (s, d) => EventOps.ewmaDaily(Tables.events(s, d), "event_type", "ts"),
      Some("""WITH daily AS (
             |  SELECT event_type, date_trunc('day', ts) AS d,
             |    count(*) AS n_events
             |  FROM events GROUP BY 1, 2),
             |idx AS (
             |  SELECT *, row_number() OVER (PARTITION BY event_type
             |    ORDER BY d) AS k
             |  FROM daily),
             |sc AS (
             |  SELECT *, CAST(CASE WHEN k = 1 THEN CAST(n_events AS DOUBLE)
             |    ELSE CAST(n_events AS DOUBLE) * pow(2.0, k - 2) END
             |    AS DECIMAL(38,0)) AS w
             |  FROM idx)
             |SELECT event_type, strftime(d, '%Y-%m-%d') AS day, n_events,
             |  CAST(sum(w) OVER (PARTITION BY event_type ORDER BY d
             |    ROWS UNBOUNDED PRECEDING) AS DOUBLE) / pow(2.0, k - 1)
             |    AS ewma
             |FROM sc
             |ORDER BY event_type, day""".stripMargin)),

    Q("sim_recall_matryoshka",
      "Matryoshka dimension-truncation recall sweep (Kusupati et al. " +
        "2022): brute-force top-10 on PREFIX slices of the embedding " +
        "(64/32/16 dims) vs the full-dimension exact ranking — the " +
        "measurement behind serving truncated MRL embeddings (train " +
        "once, serve any prefix at 1/2 or 1/4 the scan bytes and " +
        "FLOPs). Shares one exact ground truth across the sweep; each " +
        "operating point is one narrow sliced-vector scan + " +
        "TakeOrdered, and the recall join runs on ≤k-row relations. " +
        "The 64-dim point doubles as a self-test: a full-width slice " +
        "must score recall 1.0.",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val q = Similarity.vectorOf(emb, "vec_id", "embedding", 0L)
        val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
          q, 10)
        MatDims.map { dims =>
          val sliced = emb.select(col("vec_id"),
            slice(col("embedding"), 1, dims).as("embedding"))
          val approx = Similarity.bruteForceTopK(sliced, "vec_id",
            "embedding", q.take(dims), 10)
          Similarity.recallAtK(exact, approx, "vec_id", 10)
            .withColumn("dims", lit(dims.toLong))
        }.reduce(_ unionByName _)
          .select("dims", "k", "hits", "recall")
          .orderBy(col("dims").desc)
      },
      Some {
        val per = MatDims.map { dims =>
          s"""sc$dims AS MATERIALIZED (
             |  SELECT e.vec_id,
             |    ${dotSql("e.embedding", "q.qe")} /
             |      (sqrt(${dotSql("e.embedding", "e.embedding")}) *
             |       sqrt(${dotSql("q.qe", "q.qe")})) AS cos
             |  FROM embeddings e, q, generate_series(1, $dims) g(i)
             |  GROUP BY e.vec_id),
             |top$dims AS (
             |  SELECT vec_id FROM sc$dims
             |  ORDER BY cos DESC, vec_id LIMIT 10)""".stripMargin
        }.mkString(",\n")
        val rows = MatDims.map { dims =>
          s"""SELECT CAST($dims AS BIGINT) AS dims,
             |  CAST(10 AS BIGINT) AS k, count(*) AS hits,
             |  CAST(count(*) AS DOUBLE) / 10 AS recall
             |FROM top$dims JOIN top64e USING (vec_id)""".stripMargin
        }.mkString("\nUNION ALL\n")
        s"""WITH q AS (
           |  SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
           |$per,
           |top64e AS (SELECT vec_id FROM top64)
           |$rows
           |ORDER BY dims DESC""".stripMargin
      }))
}
