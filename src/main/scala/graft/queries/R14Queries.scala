package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{Dedup, Graphs, Layout, Similarity, Sinks, TextAnalysis}
import graft.queries.OracleCompat.dsum

/** Round-9 session-2 additions: the remaining classical graph analytics
  * over the near-dup similarity graph (label-propagation communities,
  * k-core peeling, landmark BFS) — each the same cached-edge-list /
  * node-keyed-exchange iteration shape as graph_pagerank, each gated by
  * an unrolled-CTE DuckDB oracle.
  */
object R14Queries {

  /** Shared oracle prelude: minhash candidate pairs → symmetrized,
    * deduplicated edge list (the exact restatement of
    * [[graft.ops.Graphs]]'s symEdges over minhashCandidates).
    */
  private[queries] def edgeCtes: String =
    s"""${ExtQueries.minhashPairCtes},
       |edges AS MATERIALIZED (
       |  SELECT id_a AS src, id_b AS dst FROM pairs
       |  UNION SELECT id_b, id_a FROM pairs)""".stripMargin

  private[queries] val LpaIters = 4

  /** The unrolled synchronous-LPA rounds (l0 … l[[LpaIters]]) over the
    * `edges` CTE — shared by graph_lpa and graph_modularity so both
    * oracles score the identical labeling.
    */
  private[queries] def lpaCtes: String = {
    val rounds = (1 to LpaIters).map { i =>
      s"""c$i AS (
         |  SELECT e.dst AS id, l.lbl, count(*) AS cnt
         |  FROM edges e JOIN l${i - 1} l ON l.id = e.src
         |  GROUP BY e.dst, l.lbl),
         |l$i AS MATERIALIZED (
         |  SELECT id, lbl FROM (
         |    SELECT id, lbl,
         |      row_number() OVER (PARTITION BY id
         |        ORDER BY cnt DESC, lbl) AS rn
         |    FROM c$i) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""l0 AS (SELECT DISTINCT src AS id, src AS lbl FROM edges),
       |$rounds""".stripMargin
  }
  private val CoreK = 2
  private val CoreRounds = 16
  private val BfsSeeds = 3
  private val BfsHops = 4

  private[queries] val GraphK = 5 // kNN-graph out-degree
  private[queries] val GraphBeam = 24
  private[queries] val GraphHops = 4

  /** DuckDB restatement of Dedup.dotExact over index i (1-based). */
  private[queries] def dotSql(a: String, b: String): String =
    s"cast(sum(cast($a[i]::DOUBLE * $b[i]::DOUBLE AS DECIMAL(38,14))) AS DOUBLE)"

  /** Oracle CTE chain for the blocked kNN graph + beam-search serve
    * ([[graft.ops.Similarity.knnGraph]] / graphAnnTopK): query norms,
    * per-node cosines, within-block pairwise dots → top-[[GraphK]]
    * edges, per-block entry points, then [[GraphHops]] unrolled
    * expand-score-prune rounds at beam [[GraphBeam]]. MATERIALIZED
    * throughout — the hop CTEs reference their predecessor twice.
    */
  private[queries] def graphAnnCtes: String = {
    val hops = (1 to GraphHops).map { i =>
      s"""c$i AS (
         |  SELECT vec_id FROM b${i - 1}
         |  UNION
         |  SELECT g.dst FROM g JOIN b${i - 1} s ON g.src = s.vec_id),
         |b$i AS MATERIALIZED (
         |  SELECT s.vec_id, s.cos FROM c$i JOIN sc s USING (vec_id)
         |  ORDER BY s.cos DESC, s.vec_id LIMIT $GraphBeam)""".stripMargin
    }.mkString(",\n")
    s"""q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |nq AS (
       |  SELECT sqrt(${dotSql("qe", "qe")}) AS nrm
       |  FROM q, generate_series(1, 64) g(i)),
       |ne AS MATERIALIZED (
       |  SELECT vec_id, sqrt(${dotSql("embedding", "embedding")}) AS nrm
       |  FROM embeddings, generate_series(1, 64) g(i) GROUP BY vec_id),
       |dots AS MATERIALIZED (
       |  SELECT e.vec_id, ${dotSql("e.embedding", "q.qe")} AS dot
       |  FROM embeddings e, q, generate_series(1, 64) g(i)
       |  GROUP BY e.vec_id),
       |sc AS MATERIALIZED (
       |  SELECT d.vec_id, d.dot / (ne.nrm * nq.nrm) AS cos
       |  FROM dots d JOIN ne USING (vec_id), nq),
       |pd AS MATERIALIZED (
       |  SELECT a.vec_id AS src, b.vec_id AS dst,
       |    ${dotSql("a.embedding", "b.embedding")} AS dot
       |  FROM embeddings a JOIN embeddings b
       |    ON a.label = b.label AND a.vec_id <> b.vec_id,
       |    generate_series(1, 64) g(i)
       |  GROUP BY a.vec_id, b.vec_id),
       |g AS MATERIALIZED (
       |  SELECT src, dst FROM (
       |    SELECT p.src, p.dst,
       |      row_number() OVER (PARTITION BY p.src
       |        ORDER BY p.dot / (na.nrm * nb.nrm) DESC, p.dst) AS rn
       |    FROM pd p JOIN ne na ON na.vec_id = p.src
       |         JOIN ne nb ON nb.vec_id = p.dst)
       |  WHERE rn <= $GraphK),
       |entries AS (
       |  SELECT vec_id FROM (
       |    SELECT vec_id,
       |      row_number() OVER (PARTITION BY label ORDER BY vec_id) AS rn
       |    FROM embeddings) WHERE rn = 1),
       |b0 AS MATERIALIZED (
       |  SELECT s.vec_id, s.cos FROM entries e JOIN sc s USING (vec_id)
       |  ORDER BY s.cos DESC, s.vec_id LIMIT $GraphBeam),
       |$hops""".stripMargin
  }

  val all: Seq[Q] = Seq(

    Q("graph_lpa",
      "Synchronous label propagation (Raghavan et al. 2007) — community " +
        "detection over the near-dup graph: plurality-label dynamics " +
        "separate dense duplicate families that one spurious candidate " +
        "edge would weld into a single connected component. Fully " +
        "deterministic variant: synchronous rounds, plurality label with " +
        "smallest-label tie-break — a pure function of the previous " +
        "round, so the oracle unrolls the identical 4 rounds as CTEs. " +
        "Per round: one join of the cached pre-partitioned edge list " +
        "against the nodes-sized label relation, a partial-aggregated " +
        "(node,label) count, and a per-node row_number — node-keyed " +
        "exchanges only, nothing quadratic in degree.",
      (s, d) => Graphs.labelPropagation(
        Dedup.minhashCandidates(Tables.documents(s, d), "doc_id", "text",
          Dedup.Shingler.words(5), bandsN = 2, rowsPerBand = 3),
        "id_a", "id_b", iters = LpaIters),
      Some(s"""WITH $edgeCtes,
              |$lpaCtes
              |SELECT id, lbl AS community FROM l$LpaIters
              |ORDER BY id""".stripMargin)),

    Q("graph_kcore",
      "2-core of the near-dup graph by iterative peeling (Seidman 1983): " +
        "drop nodes with in-subgraph degree < 2 until fixpoint — the " +
        "maximal subgraph where every doc has >=2 in-core neighbors, " +
        "separating genuinely dense duplicate families from the " +
        "incidental pair/chain edges the banding df-cap emits. " +
        "Convergence contract mirrors connectedComponents: peel with a " +
        "driver-side per-round fixpoint check (early exit — the bench " +
        "pays actual rounds), hard-fail past 16 rounds rather than " +
        "return a non-fixpoint, so the oracle's exactly-16-round unroll " +
        "(no-op rounds past the fixpoint: peeling is monotone) is " +
        "guaranteed to match. Per round: the cached edge list " +
        "semi-joined to the shrinking node set on both endpoints, one " +
        "partial-aggregated degree count.",
      (s, d) => Graphs.kCore(
        Dedup.minhashCandidates(Tables.documents(s, d), "doc_id", "text",
          Dedup.Shingler.words(5), bandsN = 2, rowsPerBand = 3),
        "id_a", "id_b", k = CoreK, maxRounds = CoreRounds),
      Some {
        val rounds = (1 to CoreRounds).map { i =>
          s"""d$i AS (
             |  SELECT e.src AS id, count(*) AS c
             |  FROM edges e
             |  JOIN n${i - 1} a ON e.src = a.id
             |  JOIN n${i - 1} b ON e.dst = b.id
             |  GROUP BY e.src),
             |n$i AS MATERIALIZED (SELECT id FROM d$i WHERE c >= $CoreK)""".stripMargin
        }.mkString(",\n")
        s"""WITH $edgeCtes,
           |n0 AS (SELECT DISTINCT src AS id FROM edges),
           |$rounds
           |SELECT id, c AS core_degree FROM d$CoreRounds
           |WHERE c >= $CoreK ORDER BY id""".stripMargin
      }),

    Q("graph_bfs",
      "Multi-source BFS from the 3 smallest-id nodes — landmark hop " +
        "distances over the near-dup graph: each node's distance to and " +
        "identity of its nearest landmark under the (dist, seed) total " +
        "order; hop-bounded at 4 (nodes beyond every landmark's 4-hop " +
        "ball are absent by contract — frontier expansion is the cost " +
        "model). Deterministic relaxation: keep the lexicographically " +
        "smallest (dist, seed) per node each synchronous round; the " +
        "oracle unrolls the same 4 relaxations. Per round: one join of " +
        "the cached pre-partitioned edge list against the " +
        "frontier-carrying state and a per-node row_number — node-keyed " +
        "exchanges only; seeds are a driver-bounded orderBy/limit.",
      (s, d) => Graphs.bfsLandmarks(
        Dedup.minhashCandidates(Tables.documents(s, d), "doc_id", "text",
          Dedup.Shingler.words(5), bandsN = 2, rowsPerBand = 3),
        "id_a", "id_b", numSeeds = BfsSeeds, maxHops = BfsHops),
      Some {
        val rounds = (1 to BfsHops).map { i =>
          s"""p$i AS (
             |  SELECT e.dst AS id, s.dist + 1 AS dist, s.seed
             |  FROM edges e JOIN s${i - 1} s ON s.id = e.src
             |  UNION ALL
             |  SELECT id, dist, seed FROM s${i - 1}),
             |s$i AS MATERIALIZED (
             |  SELECT id, dist, seed FROM (
             |    SELECT id, dist, seed,
             |      row_number() OVER (PARTITION BY id
             |        ORDER BY dist, seed) AS rn
             |    FROM p$i) WHERE rn = 1)""".stripMargin
        }.mkString(",\n")
        s"""WITH $edgeCtes,
           |nodes AS (SELECT DISTINCT src AS id FROM edges),
           |s0 AS (
           |  SELECT id, CAST(0 AS BIGINT) AS dist, id AS seed
           |  FROM nodes ORDER BY id LIMIT $BfsSeeds),
           |$rounds
           |SELECT id, dist, seed FROM s$BfsHops ORDER BY id""".stripMargin
      }),

    Q("lake_bucketed",
      "Shuffle-free co-located join from BUCKETED tables at rest " +
        "(Sinks.bucketedTable): orders and customer are both written " +
        "hash-bucketed (and sorted) on the customer key into the " +
        "session catalog, so the join and the downstream per-customer " +
        "aggregate read pre-partitioned bucket files and the whole " +
        "query plans with ZERO hash exchanges (PlanAuditSpec pins it) " +
        "— at 100 TB this is the difference between re-shuffling the " +
        "fact table on every run and paying the shuffle once at write " +
        "time. The oracle recomputes the same join/aggregate from the " +
        "raw tables, so the bucketed write+serve roundtrip is " +
        "hash-checked lossless.",
      (s, d) => {
        val sfx = d.replaceAll("[^A-Za-z0-9]", "_")
        val ot = s"graft_orders_bkt$sfx"
        val ct = s"graft_cust_bkt$sfx"
        Sinks.bucketedTable(Tables.orders(s, d)
          .select("o_orderkey", "o_custkey", "o_totalprice"),
          ot, buckets = 8, Seq("o_custkey"))
        Sinks.bucketedTable(Tables.customer(s, d)
          .select("c_custkey", "c_mktsegment"),
          ct, buckets = 8, Seq("c_custkey"))
        s.table(ot)
          .join(s.table(ct), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_custkey"), col("c_mktsegment"))
          .agg(count(lit(1)).as("n_orders"),
            dsum(col("o_totalprice")).as("total"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_mktsegment, count(*) AS n_orders,
             |  cast(sum(cast(o_totalprice AS DECIMAL(28,8))) AS DOUBLE)
             |    AS total
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY 1, 2
             |ORDER BY c_custkey""".stripMargin)),

    Q("lake_zorder",
      "Z-ORDERED rewrite + box probe, the serve-path gate for " +
        "Layout.zOrderedParquet: lineitem is clustered along the " +
        "Morton curve of (l_partkey, l_suppkey) — every file covers a " +
        "small rectangle of the key plane, so parquet min/max stats " +
        "prune on EITHER dimension (LayoutSpec measures the file " +
        "boxes; a plain x-sort leaves y-filters pruning nothing) — " +
        "then a two-dimensional box predicate reads the layout back " +
        "and aggregates. Pruning must never change results: the " +
        "oracle recomputes the box aggregate from the raw table, " +
        "hash-checking the rewrite as lossless and the probe as " +
        "exact.",
      (s, d) => {
        val path = sys.props.getOrElse("java.io.tmpdir", "/tmp") +
          "/graft_zorder_" + d.replaceAll("[^A-Za-z0-9.]", "_")
        Layout.zOrderedParquet(Tables.lineitem(s, d)
          .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
            "l_returnflag"),
          path, numFiles = 8, "l_partkey", "l_suppkey")
        s.read.parquet(path)
          .filter(col("l_partkey").between(20, 79) &&
            col("l_suppkey").between(2, 5))
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"),
            dsum(col("l_quantity")).as("sum_qty"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, count(*) AS n,
             |  cast(sum(cast(l_quantity AS DECIMAL(28,8))) AS DOUBLE)
             |    AS sum_qty
             |FROM lineitem
             |WHERE l_partkey BETWEEN 20 AND 79
             |  AND l_suppkey BETWEEN 2 AND 5
             |GROUP BY 1
             |ORDER BY l_returnflag""".stripMargin)),

    Q("dq_kanon",
      "k-anonymity audit over quasi-identifiers (Sweeney 2002) — the " +
        "privacy gate a training-data release runs next to PII " +
        "redaction: every (lang, source, length-bucket) equivalence " +
        "class with fewer than k=5 members is a re-identification " +
        "risk (its documents are distinguishable by quasi-identifiers " +
        "alone). One partial-aggregated groupBy on the class key — " +
        "the report is class-sized, never document-sized.",
      (s, d) => Tables.documents(s, d)
        .groupBy(col("lang"), col("source"),
          floor(col("n_chars") / lit(100)).cast("long").as("len_bucket"))
        .agg(count(lit(1)).as("n_docs"))
        .filter(col("n_docs") < 5)
        .orderBy("lang", "source", "len_bucket"),
      Some("""SELECT lang, source,
             |  CAST(floor(n_chars / 100.0) AS BIGINT) AS len_bucket,
             |  count(*) AS n_docs
             |FROM documents
             |GROUP BY 1, 2, 3
             |HAVING count(*) < 5
             |ORDER BY lang, source, len_bucket""".stripMargin)),

    Q("ev_downsample",
      "Time-bucket downsampling with open/close semantics (the OHLC " +
        "shape every metrics store serves): per (event_type, day) the " +
        "first and last value under the total (ts, event_id) order " +
        "plus min/max/count/decimal-exact sum. First/last via two " +
        "row_number passes over the SAME partition keys — one " +
        "shuffle, two sorts — then one partial-aggregated groupBy; " +
        "no self-join, no collect. The deterministic replacement for " +
        "first()/last() (which are order-undefined in both engines).",
      (s, d) => {
        val ev = Tables.events(s, d)
          .withColumn("day", date_format(date_trunc("day", col("ts")),
            "yyyy-MM-dd"))
        val w = Window.partitionBy(col("event_type"), col("day"))
        val asc = w.orderBy(col("ts").asc, col("event_id").asc)
        val desc = w.orderBy(col("ts").desc, col("event_id").desc)
        ev.withColumn("__ra", row_number().over(asc))
          .withColumn("__rd", row_number().over(desc))
          .groupBy(col("event_type"), col("day"))
          .agg(max(when(col("__ra") === 1, col("value"))).as("open"),
            max(when(col("__rd") === 1, col("value"))).as("close"),
            min(col("value")).as("lo"), max(col("value")).as("hi"),
            count(lit(1)).as("n"), dsum(col("value")).as("vsum"))
          .orderBy("event_type", "day")
      },
      Some("""WITH r AS (
             |  SELECT event_type,
             |    strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             |    value,
             |    row_number() OVER (PARTITION BY event_type,
             |      date_trunc('day', ts) ORDER BY ts, event_id) AS ra,
             |    row_number() OVER (PARTITION BY event_type,
             |      date_trunc('day', ts) ORDER BY ts DESC, event_id DESC)
             |      AS rd
             |  FROM events)
             |SELECT event_type, day,
             |  max(CASE WHEN ra = 1 THEN value END) AS open,
             |  max(CASE WHEN rd = 1 THEN value END) AS close,
             |  min(value) AS lo, max(value) AS hi, count(*) AS n,
             |  cast(sum(cast(value AS DECIMAL(28,8))) AS DOUBLE) AS vsum
             |FROM r
             |GROUP BY 1, 2
             |ORDER BY event_type, day""".stripMargin)),

    Q("ta_textrank",
      "TextRank (Mihalcea & Tarau 2004) over word-window units — " +
        "representative-passage selection: each document's 8-word " +
        "windows form an overlap graph (weight = INTEGER count of " +
        "shared distinct words, so the per-node weight total is an " +
        "exact integer — a real-valued weight would make it a " +
        "rounded decimal whose division manufactures doubles on the " +
        "15th-decimal cast boundary where the engines disagree), 2 " +
        "rounds of weighted PageRank rank them, " +
        "the most central window wins (ties to the smallest index). " +
        "The pair stage joins windows ON doc_id — work is per-doc " +
        "windows², bounded by the document-length contract, never " +
        "corpus-quadratic. The gate hashes the SELECTION (winner " +
        "index + text), not the raw score: each round re-stages " +
        "rank mass through DECIMAL(38,14), which grid-aligns the " +
        "next round's inputs and makes the score's last decimal " +
        "land exactly on the cast-rounding boundary where Spark " +
        "(shortest-repr) and DuckDB (exact-binary) legitimately " +
        "disagree by 1 ulp14 — the decision is engine-exact, the " +
        "k-round float tail is not, and the oracle checks exactly " +
        "what is exact.",
      (s, d) => TextAnalysis.textRankWindows(Tables.documents(s, d),
          "doc_id", "text", windowWords = 8, damping = 0.85, iters = 2)
        .select("doc_id", "best_widx", "n_windows", "window_text"),
      Some {
        val rounds = (1 to 2).map { i =>
          s"""c$i AS (
             |  SELECT e.doc_id, e.dst AS widx,
             |    cast(sum(cast(r.r * e.wt / j.wj AS DECIMAL(38,14)))
             |      AS DOUBLE) AS sc
             |  FROM pe e
             |  JOIN r${i - 1} r ON r.doc_id = e.doc_id AND r.widx = e.src
             |  JOIN wj_t j ON j.doc_id = e.doc_id AND j.src = e.src
             |  GROUP BY e.doc_id, e.dst),
             |r$i AS MATERIALIZED (
             |  SELECT c.doc_id, c.widx,
             |    0.85::DOUBLE * coalesce(x.sc, 0.0::DOUBLE) +
             |      (1.0::DOUBLE - 0.85::DOUBLE) / n.nw AS r
             |  FROM ch c JOIN nn n USING (doc_id)
             |  LEFT JOIN c$i x ON x.doc_id = c.doc_id
             |    AND x.widx = c.widx)""".stripMargin
        }.mkString(",\n")
        s"""WITH w AS (
           |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws
           |  FROM documents),
           |chi AS (
           |  SELECT doc_id, ws,
           |    unnest(generate_series(1,
           |      CAST(ceil(len(ws) / 8.0) AS INT))) AS widx
           |  FROM w),
           |ch AS MATERIALIZED (
           |  SELECT doc_id, widx,
           |    list_distinct(list_slice(ws, (widx - 1) * 8 + 1,
           |      least(widx * 8, len(ws)))) AS cs,
           |    array_to_string(list_slice(ws, (widx - 1) * 8 + 1,
           |      least(widx * 8, len(ws))), ' ') AS wtext
           |  FROM chi),
           |nn AS (SELECT doc_id, count(*) AS nw FROM ch GROUP BY doc_id),
           |pe AS MATERIALIZED (
           |  SELECT a.doc_id, a.widx AS src, b.widx AS dst,
           |    CAST(len(list_intersect(a.cs, b.cs)) AS BIGINT) AS wt
           |  FROM ch a JOIN ch b
           |    ON a.doc_id = b.doc_id AND a.widx <> b.widx
           |  WHERE len(list_intersect(a.cs, b.cs)) > 0),
           |wj_t AS (
           |  SELECT doc_id, src, CAST(sum(wt) AS BIGINT) AS wj
           |  FROM pe GROUP BY doc_id, src),
           |r0 AS (
           |  SELECT c.doc_id, c.widx, 1.0::DOUBLE / n.nw AS r
           |  FROM ch c JOIN nn n USING (doc_id)),
           |$rounds
           |SELECT doc_id, widx AS best_widx, nw AS n_windows,
           |  wtext AS window_text
           |FROM (
           |  SELECT r2.doc_id, r2.widx, r2.r, n.nw, c.wtext,
           |    row_number() OVER (PARTITION BY r2.doc_id
           |      ORDER BY r2.r DESC, r2.widx) AS rn
           |  FROM r2 JOIN nn n USING (doc_id)
           |  JOIN ch c ON c.doc_id = r2.doc_id AND c.widx = r2.widx)
           |WHERE rn = 1
           |ORDER BY doc_id""".stripMargin
      }),

    Q("ta_keywords_rank",
      "TextRank keyword extraction — the original Mihalcea & Tarau " +
        "task: words are nodes, adjacency within a document is an " +
        "edge (self-pairs dropped), and corpus-global PageRank " +
        "centrality ranks the vocabulary; top 20 by (rank desc, term) " +
        ". Reuses Graphs.pageRank verbatim (generic over node type) — " +
        "the adjacency scan is one zero-shuffle projection, the edge " +
        "list is vocabulary-bounded, and every iteration shuffles " +
        "only the vocab-sized rank relation.",
      (s, d) => {
        val w = split(trim(col("text")), "\\s+")
        val pairs = Tables.documents(s, d)
          .select(explode(zip_with(
            slice(w, lit(1), greatest(size(w) - 1, lit(0))),
            slice(w, lit(2), greatest(size(w) - 1, lit(0))),
            (x, y) => struct(x.as("wa"), y.as("wb")))).as("p"))
          .select(col("p.wa").as("id_a"), col("p.wb").as("id_b"))
          .filter(col("id_a") =!= col("id_b"))
        Graphs.pageRank(pairs, "id_a", "id_b", damping = 0.85, iters = 3)
          .select(col("id").as("term"), col("pagerank").as("rank_score"))
          .orderBy(col("rank_score").desc, col("term").asc)
          .limit(20)
      },
      Some {
        val rounds = (1 to 3).map { i =>
          s"""c$i AS (
             |  SELECT e.dst AS id,
             |    cast(sum(cast(r.r / d.deg AS DECIMAL(38,14))) AS DOUBLE)
             |      AS s
             |  FROM edges e JOIN r${i - 1} r ON r.id = e.src
             |       JOIN deg d ON d.src = e.src
             |  GROUP BY e.dst),
             |r$i AS MATERIALIZED (
             |  SELECT id, 0.85::DOUBLE * s +
             |    (1.0::DOUBLE - 0.85::DOUBLE) / n AS r
             |  FROM c$i, nn)""".stripMargin
        }.mkString(",\n")
        s"""WITH w AS (
           |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws
           |  FROM documents),
           |wp AS (
           |  SELECT ws[i] AS a, ws[i + 1] AS b FROM (
           |    SELECT ws, unnest(generate_series(1, len(ws) - 1)) AS i
           |    FROM w)
           |  WHERE ws[i] <> ws[i + 1]),
           |edges AS MATERIALIZED (
           |  SELECT a AS src, b AS dst FROM wp
           |  UNION SELECT b, a FROM wp),
           |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
           |nn AS (SELECT count(*) AS n FROM deg),
           |r0 AS (SELECT src AS id, 1.0::DOUBLE / n AS r FROM deg, nn),
           |$rounds
           |SELECT id AS term, r AS rank_score FROM r3
           |ORDER BY r DESC, id LIMIT 20""".stripMargin
      }),

    Q("src_csv_roundtrip",
      "CSV sink → CSV source ROUNDTRIP gate (K3 + S1 get an oracle " +
        "row, not just a spec): customer writes through Sinks.csv " +
        "(header, partition-parallel) and reads back through " +
        "Tables.csv with the caller-supplied schema (no inference " +
        "pass), then aggregates per segment. The oracle recomputes " +
        "from the original parquet, so the text roundtrip — double " +
        "formatting/parsing included (shortest-repr doubles reparse " +
        "bit-exactly) — is hash-checked lossless.",
      (s, d) => {
        val base = Tables.customer(s, d)
          .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
        val path = sys.props.getOrElse("java.io.tmpdir", "/tmp") +
          "/graft_csvrt_" + d.replaceAll("[^A-Za-z0-9.]", "_")
        Sinks.csv(base, path)
        Tables.csv(s, path, base.schema)
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n"),
            dsum(col("c_acctbal")).as("total_bal"),
            min(col("c_name")).as("first_name"))
          .orderBy("c_mktsegment")
      },
      Some("""SELECT c_mktsegment, count(*) AS n,
             |  cast(sum(cast(c_acctbal AS DECIMAL(28,8))) AS DOUBLE)
             |    AS total_bal,
             |  min(c_name) AS first_name
             |FROM customer
             |GROUP BY 1
             |ORDER BY c_mktsegment""".stripMargin)),

    Q("src_json_roundtrip",
      "JSON-lines sink → source ROUNDTRIP gate (the interchange " +
        "format of crawled corpora): events writes through " +
        "Sinks.jsonLines and reads back schema-first through " +
        "Tables.jsonLines — both sides pin a MICROSECOND timestamp " +
        "format (the default JSON format truncates to millis, a " +
        "silent precision loss this row exists to catch) — then " +
        "aggregates per type including the max event time " +
        "re-formatted to full precision. Oracle recomputes from " +
        "parquet: the roundtrip is hash-checked to the microsecond.",
      (s, d) => {
        val tsFmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
        val base = Tables.events(s, d)
          .select("event_id", "user_id", "event_type", "value", "ts")
        val path = sys.props.getOrElse("java.io.tmpdir", "/tmp") +
          "/graft_jsonrt_" + d.replaceAll("[^A-Za-z0-9.]", "_")
        Sinks.jsonLines(base, path, Map("timestampFormat" -> tsFmt))
        Tables.jsonLines(s, path, base.schema,
            Map("timestampFormat" -> tsFmt))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            dsum(col("value")).as("sum_value"),
            date_format(max(col("ts")), tsFmt).as("last_ts"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, count(*) AS n,
             |  cast(sum(cast(value AS DECIMAL(28,8))) AS DOUBLE)
             |    AS sum_value,
             |  strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS last_ts
             |FROM events
             |GROUP BY 1
             |ORDER BY event_type""".stripMargin)),

    Q("src_orc_roundtrip",
      "ORC sink → source ROUNDTRIP gate (the other columnar lake " +
        "format, same pushdown/pruning properties as parquet): " +
        "lineitem writes through Sinks.orc, reads back through " +
        "Tables.orc, and aggregates per return flag; the oracle " +
        "recomputes from the original parquet — format conversion " +
        "hash-checked lossless.",
      (s, d) => {
        val path = sys.props.getOrElse("java.io.tmpdir", "/tmp") +
          "/graft_orcrt_" + d.replaceAll("[^A-Za-z0-9.]", "_")
        Sinks.orc(Tables.lineitem(s, d)
          .select("l_orderkey", "l_quantity", "l_extendedprice",
            "l_returnflag"), path)
        Tables.orc(s, path)
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"),
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_price"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, count(*) AS n,
             |  cast(sum(cast(l_quantity AS DECIMAL(28,8))) AS DOUBLE)
             |    AS sum_qty,
             |  cast(sum(cast(l_extendedprice AS DECIMAL(28,8))) AS DOUBLE)
             |    AS sum_price
             |FROM lineitem
             |GROUP BY 1
             |ORDER BY l_returnflag""".stripMargin)),

    Q("lake_sorted",
      "Range-sorted rewrite + range probe, the serve-path gate for " +
        "Layout.sortedParquet: orders rewrites range-partitioned and " +
        "sorted on the customer key so every file covers a disjoint " +
        "key range (LayoutSpec pins the disjointness — min/max stats " +
        "then actually prune a key-range scan), and a range predicate " +
        "reads the layout back and aggregates. Oracle recomputes from " +
        "the raw table: the rewrite is hash-checked lossless, the " +
        "probe exact.",
      (s, d) => {
        val path = sys.props.getOrElse("java.io.tmpdir", "/tmp") +
          "/graft_sortedrt_" + d.replaceAll("[^A-Za-z0-9.]", "_")
        Layout.sortedParquet(Tables.orders(s, d)
            .select("o_orderkey", "o_custkey", "o_orderstatus",
              "o_totalprice"),
          path, numFiles = 8, Seq("o_custkey"))
        s.read.parquet(path)
          .filter(col("o_custkey").between(100, 400))
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, count(*) AS n,
             |  cast(sum(cast(o_totalprice AS DECIMAL(28,8))) AS DOUBLE)
             |    AS total
             |FROM orders
             |WHERE o_custkey BETWEEN 100 AND 400
             |GROUP BY 1
             |ORDER BY o_orderstatus""".stripMargin)),

    Q("sim_graphann",
      "Graph-navigable ANN (HNSW/NSG lineage, Malkov & Yashunin " +
        "2018) — the sixth index family: a blocked kNN graph (each " +
        "vector keeps 5 edges to its nearest within-block neighbors; " +
        "per-block work is |block|² dots, never corpus-quadratic) " +
        "served by beam search — per-block entry points, 4 " +
        "expand-score-prune rounds at beam 24 (degree 5 beat 8 in the " +
        "recall gate: higher out-degree floods the beam with " +
        "same-block nodes and prunes cross-block exploration), " +
        "scoring ONLY the " +
        "≤beam·(degree+1) candidates per hop, so serve cost is " +
        "hops × beam × degree, independent of corpus size. Fully " +
        "deterministic (exact decimal cosine, id tie-breaks); the " +
        "oracle replays the graph build and every beam round.",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val q = Similarity.vectorOf(emb, "vec_id", "embedding", 0L)
        Similarity.graphAnnTopK(emb, "vec_id", "embedding", "label", q,
          k = 10, kNbrs = GraphK, beam = GraphBeam, hops = GraphHops)
      },
      Some(s"""WITH $graphAnnCtes
              |SELECT vec_id, cos AS cos_sim FROM b$GraphHops
              |ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin)),

    Q("sim_recall_graphann",
      "Recall@10 gate for the graph-navigable index (every index " +
        "family ships gated): beam-search result vs exact brute " +
        "force, both deterministic, the recall a hash-checkable " +
        "scalar. The oracle replays the kNN-graph build, the beam " +
        "walk, the exact ranking, and the intersection.",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val q = Similarity.vectorOf(emb, "vec_id", "embedding", 0L)
        val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
          q, 10)
        val approx = Similarity.graphAnnTopK(emb, "vec_id", "embedding",
          "label", q, k = 10, kNbrs = GraphK, beam = GraphBeam,
          hops = GraphHops)
        Similarity.recallAtK(exact, approx, "vec_id", 10)
      },
      Some(s"""WITH $graphAnnCtes,
              |exact AS (
              |  SELECT vec_id FROM sc ORDER BY cos DESC, vec_id LIMIT 10),
              |approx AS (
              |  SELECT vec_id FROM b$GraphHops
              |  ORDER BY cos DESC, vec_id LIMIT 10)
              |SELECT CAST(10 AS BIGINT) AS k,
              |  count(*) AS hits,
              |  CASE WHEN (SELECT count(*) FROM exact) > 0
              |    THEN CAST(count(*) AS DOUBLE) /
              |         (SELECT count(*) FROM exact)
              |    ELSE 0.0 END AS recall
              |FROM approx JOIN exact USING (vec_id)""".stripMargin)))
}
