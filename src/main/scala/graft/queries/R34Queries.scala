package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{Dedup, Profile}

/** Round-14: oracle rows for the remaining approximation path whose
  * degraded branch never bound under a CORRECTNESS entry — minhash
  * banding's `maxBandDf` chain (the r13 verdict's task 2; same gap
  * class r13 closed for the simhash pigeonhole's `maxChunkDf`).
  */
object R34Queries {

  /** maxBandDf for the binding run. At 1, EVERY multi-doc band group
    * exceeds the cap, so the id-ordered chain branch produces the
    * whole pair output; the fixture corpora contain band groups of 3
    * (sf0.01) and 4 (sf0.001) docs, whose chains emit strictly fewer
    * pairs than the all-pairs join — capped ≠ exact by construction
    * at both probe scales, so a chain-path bug cannot hide behind the
    * exact path's answer.
    */
  private val CapDf = 1

  // NOTE: constants referenced by `all` must be declared ABOVE it —
  // a val below reads as 0/null during object init (twice-bitten rule)
  private val SketchK = 256

  private val DriftCols = Seq("l_orderkey", "l_partkey", "l_linenumber",
    "l_returnflag", "l_linestatus")

  val all: Seq[Q] = Seq(

    Q("dedup_minhash_capped",
      "The band-frequency guard of MinHash-LSH banding, made to BIND: " +
        "minhashCandidates with maxBandDf = " + CapDf + " (production " +
        "ships 256, which no sf0.01 band group reaches — the guard was " +
        "spec-tested but oracle-vacuous). Every band group over the cap " +
        "degrades from the quadratic band-key self-join to the " +
        "id-ordered chain — O(group) pairs, connected components " +
        "preserved — and at cap 1 the chain carries the ENTIRE output, " +
        "so the oracle (the same parameterized CTE as dedup_minhash, " +
        "windowed df count + sub-cap equi-join + over-cap lead() chain) " +
        "hash-checks the degraded branch itself, not the exact path.",
      (s, d) => Dedup.minhashCandidates(Tables.documents(s, d), "doc_id",
          "text", Dedup.Shingler.words(5), bandsN = 2, rowsPerBand = 3,
          maxBandDf = CapDf)
        .orderBy("id_a", "id_b"),
      Some(
        s"""WITH ${ExtQueries.minhashPairCtes(CapDf)}
           |SELECT id_a, id_b, count(*) AS bands_matched
           |FROM pairs
           |GROUP BY 1, 2
           |ORDER BY id_a, id_b""".stripMargin)),

    Q("dedup_contamination_capped",
      "The bench-side shingle-frequency guard of decontamination, made " +
        "to BIND: contamination with maxBenchDf = 1, so every 3-gram " +
        "appearing in 2+ benchmark docs (" + "~100 on the sf0.01 bench " +
        "slice) is stop-listed from the join — the guard the r14 " +
        "flagship probe motivated (train_df x bench_df join rows went " +
        "quadratic, 2.4 -> 161 MB shuffle at 10x, when the bench side " +
        "grew with the corpus). Dropping boilerplate shingles lowers " +
        "n_common for real pairs, so capped != exact on the fixtures " +
        "and the oracle (the dedup_contamination CTE plus a bench-df " +
        "window filter) hash-checks the stop-list path itself.",
      (s, d) => {
        val docs = Tables.documents(s, d)
        Dedup.contamination(
            docs.filter(col("doc_id") % 10 =!= 0),
            docs.filter(col("doc_id") % 10 === 0),
            "doc_id", "text", Dedup.Shingler.words(3), minCommon = 3,
            maxBenchDf = 1)
          .orderBy("id")
      },
      Some(s"""WITH tsh AS (
              |  SELECT doc_id AS id, unnest(${ExtQueries.wordShingleSqlPub("text", 3)}) AS sh
              |  FROM documents WHERE doc_id % 10 <> 0),
              |bsh0 AS (
              |  SELECT doc_id AS bid, unnest(${ExtQueries.wordShingleSqlPub("text", 3)}) AS sh
              |  FROM documents WHERE doc_id % 10 = 0),
              |bsh AS (
              |  SELECT bid, sh FROM (
              |    SELECT bid, sh, count(*) OVER (PARTITION BY sh) AS dfb
              |    FROM bsh0)
              |  WHERE dfb <= 1),
              |common AS (
              |  SELECT id, bid, count(*) AS n FROM tsh JOIN bsh USING (sh)
              |  GROUP BY 1, 2)
              |SELECT id, count(*) AS n_bench_hits, max(n) AS max_overlap
              |FROM common WHERE n >= 3
              |GROUP BY id ORDER BY id""".stripMargin)),

    Q("dq_drift_sketch",
      "Cardinality-drift gate in the 100 TB sketch shape: per column, " +
        "KMV distinct estimates for a reference (even l_orderkey) and a " +
        "current (odd) snapshot — ONE Expand-free aggregation per " +
        "snapshot — plus the cur/ref cardinality ratio and a " +
        "distinct-VALUE churn estimate from KMV set algebra (the union " +
        "sketch's k-minima are exact, membership within them is exact, " +
        "so |in both| / |union sketch| estimates Jaccard). The split by " +
        "orderkey parity makes l_orderkey fully churned (jaccard 0) " +
        "while l_partkey and the flag columns are shared (jaccard near " +
        "1) — both churn regimes and both estimator paths (exact below " +
        "k, estimating above) bind under the oracle, which re-derives " +
        "every k-minimum list with ORDER BY h LIMIT k and replays the " +
        "arithmetic bit-for-bit.",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        Profile.driftSketch(
          li.filter(col("l_orderkey") % 2 === 0),
          li.filter(col("l_orderkey") % 2 === 1),
          DriftCols, k = SketchK)
      },
      Some(driftSketchOracle))
  )

  /** DuckDB replay of [[Profile.driftSketch]]: per column and side, the
    * k smallest distinct 52-bit md5 hashes (ORDER BY h LIMIT k), the KMV
    * estimator on each, and the union-sketch Jaccard — all integer min-k
    * algebra plus double divisions on identical integers, so the compare
    * is a hash match, not a tolerance.
    */
  private def driftSketchOracle: String = {
    val k = SketchK
    val rse = 1.0 / math.sqrt(k - 2.0)
    val ctes = DriftCols.map { c =>
      s"""hr_$c AS (
         |  SELECT DISTINCT ('0x' || substring(md5($c::VARCHAR), 1, 13))::BIGINT AS h
         |  FROM lineitem WHERE l_orderkey % 2 = 0 AND $c IS NOT NULL),
         |hc_$c AS (
         |  SELECT DISTINCT ('0x' || substring(md5($c::VARCHAR), 1, 13))::BIGINT AS h
         |  FROM lineitem WHERE l_orderkey % 2 = 1 AND $c IS NOT NULL),
         |skr_$c AS (SELECT h FROM hr_$c ORDER BY h LIMIT $k),
         |skc_$c AS (SELECT h FROM hc_$c ORDER BY h LIMIT $k),
         |sku_$c AS (
         |  SELECT h FROM (SELECT h FROM skr_$c UNION SELECT h FROM skc_$c)
         |  ORDER BY h LIMIT $k),
         |st_$c AS (
         |  SELECT
         |    (SELECT count(*) FROM skr_$c) AS nr,
         |    (SELECT max(h) FROM skr_$c) AS hr,
         |    (SELECT count(*) FROM skc_$c) AS nc,
         |    (SELECT max(h) FROM skc_$c) AS hc,
         |    (SELECT count(*) FROM sku_$c) AS nu,
         |    (SELECT count(*) FROM sku_$c u
         |     WHERE u.h IN (SELECT h FROM skr_$c)
         |       AND u.h IN (SELECT h FROM skc_$c)) AS nboth)""".stripMargin
    }.mkString(",\n")
    val estR = s"CASE WHEN nr < $k THEN nr::DOUBLE ELSE ${(k - 1).toDouble} / (hr / 4503599627370496.0) END"
    val estC = s"CASE WHEN nc < $k THEN nc::DOUBLE ELSE ${(k - 1).toDouble} / (hc / 4503599627370496.0) END"
    val rows = DriftCols.map { c =>
      s"""SELECT '$c' AS col_name,
         |  $estR AS ref_distinct_est,
         |  $estC AS cur_distinct_est,
         |  nr < $k AS ref_est_is_exact,
         |  nc < $k AS cur_est_is_exact,
         |  CASE WHEN ($estR) > 0 THEN ($estC) / ($estR) END AS card_ratio,
         |  CASE WHEN nu > 0 THEN nboth::DOUBLE / nu::DOUBLE END AS jaccard_est,
         |  $rse AS est_rse
         |FROM st_$c""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"WITH $ctes\n$rows\nORDER BY col_name"
  }
}
