package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{Dedup, Profile}

/** Round-13: oracle rows for approximation paths that previously only
  * bound in specs — the capped simhash pigeonhole (mass-duplicate
  * guard), whose chain semantics no CORRECTNESS row exercised because
  * fixture chunk groups never reached the production cap of 256.
  */
object R33Queries {

  /** Small enough that 16-bit chunk groups at BOTH sf0.001 and sf0.01
    * overflow it (the 4-real-bit top chunk averages docs/16 per value),
    * so the id-ordered chain path actually produces the output the
    * oracle checks — capped ≠ exact by construction at fixture scale.
    */
  private val CapDf = 2

  /** KMV size for dq_profile_sketch: small enough that l_orderkey and
    * l_partkey bind the estimating path at sf0.01 (15k / 2k distinct),
    * large enough for ~6% expected RSE.
    */
  private val SketchK = 256

  private val ProfCols = Seq("l_orderkey", "l_partkey", "l_linenumber",
    "l_returnflag", "l_linestatus")

  /** Single-pass DuckDB replay of the KMV profile over lineitem — the
    * oracle for BOTH the one-pass query and the incremental serve
    * (whose merge algebra makes them bit-identical).
    */
  private def kmvOracle(withMinMax: Boolean): String = {
    val k = SketchK
    val rse = 1.0 / math.sqrt(k - 2.0)
    val ctes = ProfCols.map { c =>
      s"""h_$c AS (
         |  SELECT DISTINCT ('0x' || substring(md5($c::VARCHAR), 1, 13))::BIGINT AS h
         |  FROM lineitem WHERE $c IS NOT NULL),
         |sk_$c AS (
         |  SELECT (SELECT count(*) FROM (SELECT h FROM h_$c ORDER BY h LIMIT $k)) AS nsk,
         |         (SELECT max(h) FROM (SELECT h FROM h_$c ORDER BY h LIMIT $k)) AS hk)""".stripMargin
    }.mkString(",\n")
    val minMax = (c: String) =>
      if (withMinMax)
        s"""|  (SELECT min($c)::VARCHAR FROM lineitem) AS min_s,
            |  (SELECT max($c)::VARCHAR FROM lineitem) AS max_s,
            |""".stripMargin
      else "\n"
    val rows = ProfCols.map { c =>
      s"""SELECT '$c' AS col_name,
         |  (SELECT count($c) FROM lineitem) AS n_nonnull,
         |  CASE WHEN nsk < $k THEN nsk::DOUBLE
         |       ELSE ${(k - 1).toDouble} / (hk / 4503599627370496.0)
         |       END AS n_distinct_est,
         |  nsk < $k AS est_is_exact,
         |  $rse AS est_rse,
         |${minMax(c)}  (SELECT count(*) FROM lineitem) AS n_rows
         |FROM sk_$c""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"WITH $ctes\n$rows\nORDER BY col_name"
  }

  val all: Seq[Q] = Seq(

    Q("dedup_simhash_capped",
      "The mass-duplicate guard of the Hamming pigeonhole join, made to " +
        "BIND: simhashPairs with maxChunkDf = " + CapDf + " on the " +
        "16-bit document signatures. Chunk groups over the cap degrade " +
        "from the quadratic equi-join to the id-ordered chain — O(group) " +
        "pairs, components only ever coarsened, never split — and at " +
        "this cap nearly every group takes the chain, so the output " +
        "DIFFERS from exact mode and the oracle restates the full capped " +
        "semantics (windowed df count, sub-cap equi-join with hamming " +
        "<= r filter, over-cap lead() chain keeping hamming as measured " +
        "and unfiltered). This is the CORRECTNESS row for the path " +
        "mm_pipeline ships at maxChunkDf = 256, where sf0.01 groups " +
        "never reach the cap and capped == exact vacuously.",
      (s, d) => Dedup.simhashPairs(
          Dedup.simhash16(Tables.documents(s, d), "doc_id", "text"),
          "doc_id", maxHamming = 2, bits = 16, maxChunkDf = CapDf)
        .orderBy("id_a", "id_b"),
      Some {
        // mirrors simhashPairs' capped branch: 3 chunks of ceil(16/3)=6
        // bits (the top chunk holds 4 real bits), df per (chunk, value),
        // pairs from the <=cap groups, chains from the >cap groups
        s"""WITH ${ExtQueries.simhash16Ctes},
           |chk AS (
           |  SELECT doc_id, simhash, c.chunk,
           |         (simhash >> (c.chunk * 6)) & 63 AS cv
           |  FROM shsig, (VALUES (0), (1), (2)) c(chunk)),
           |dfc AS (
           |  SELECT doc_id, simhash, chunk, cv,
           |         count(*) OVER (PARTITION BY chunk, cv) AS df_c
           |  FROM chk),
           |small AS (
           |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           |         CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT)
           |           AS hamming
           |  FROM dfc a JOIN dfc b
           |    ON a.chunk = b.chunk AND a.cv = b.cv
           |       AND a.doc_id < b.doc_id
           |  WHERE a.df_c <= $CapDf AND b.df_c <= $CapDf
           |    AND bit_count(xor(a.simhash, b.simhash)) <= 2),
           |chain0 AS (
           |  SELECT doc_id, simhash,
           |         lead(doc_id) OVER (PARTITION BY chunk, cv
           |                            ORDER BY doc_id) AS next_id,
           |         lead(simhash) OVER (PARTITION BY chunk, cv
           |                             ORDER BY doc_id) AS next_sh
           |  FROM dfc WHERE df_c > $CapDf),
           |chain AS (
           |  SELECT DISTINCT doc_id AS id_a, next_id AS id_b,
           |         CAST(bit_count(xor(simhash, next_sh)) AS BIGINT)
           |           AS hamming
           |  FROM chain0 WHERE next_id IS NOT NULL)
           |SELECT id_a, id_b, hamming
           |FROM (SELECT * FROM small UNION SELECT * FROM chain)
           |ORDER BY id_a, id_b""".stripMargin
      }),

    Q("dq_profile_sketch",
      "dq_profile's 100 TB shape: distinct counts from a KMV sketch " +
        "(k smallest distinct 52-bit md5 hashes per column, a mergeable " +
        "TypedImperativeAggregate with k*8 bytes of state) instead of " +
        "countDistinct — ONE aggregation of each row per column with no " +
        "Expand, where the exact plan replicates every row once per " +
        "distinct set before the partial aggregate. The estimator " +
        "(k-1)/u_k is deterministic (no RNG: distinct-min is order-" +
        "independent), so the oracle re-derives the identical k-minimum " +
        "hash list with ORDER BY h LIMIT k and replays the arithmetic " +
        "bit-for-bit; columns with < k distinct values report EXACT " +
        "counts (est_is_exact), the two high-cardinality keys exercise " +
        "the estimating path, and est_rse carries the 1/sqrt(k-2) " +
        "expected relative error. Accuracy vs exact countDistinct is " +
        "spec-gated at 4*RSE (ProfileSpec).",
      (s, d) => Profile.tableSketch(Tables.lineitem(s, d), ProfCols,
          k = SketchK)
        .orderBy("col_name"),
      Some(kmvOracle(withMinMax = true))),

    Q("inc_profile_sketch",
      "The KMV profile maintained INCREMENTALLY at rest: three " +
        "disjoint lineitem batches each persist a per-column partial " +
        "(k-minimum-hash sketch + counts) under commit markers; the " +
        "serve merges cols x batches sketch ROWS — facts are never " +
        "rescanned. Because KMV merge is exact set algebra (the union " +
        "of per-batch k-minima contains the global k-minima; min-k " +
        "over partials EQUALS the one-pass sketch — a semilattice), " +
        "the served incremental ESTIMATE is hash-gated against the " +
        "oracle's single-pass replay — unlike inc_distinct's HLL, " +
        "which can only be tolerance-gated. The gated claim is " +
        "incremental == recompute, bit-for-bit, including the " +
        "estimating path on both high-cardinality keys.",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val path = sys.props.getOrElse("java.io.tmpdir", "/tmp") +
          "/graft_incprof_" + d.replaceAll("[^A-Za-z0-9.]", "_")
        (0L to 2L).foreach { b =>
          graft.ops.IncrementalAgg.writeBatch(
            Profile.sketchProfilePartials(
              li.filter(col("l_orderkey") % 3 === b), ProfCols, SketchK),
            path, b)
        }
        Profile.serveSketchProfile(s, path, SketchK)
      },
      Some(kmvOracle(withMinMax = false)))
  )
}
