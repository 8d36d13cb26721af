package graft.queries

import graft.ops.EntityResolution

/** Round-15: oracle row for the ER hot-block guard. Every Dedup-family
  * quadratic guard (`maxBandDf`, `maxChunkDf`, `maxBenchDf`) is
  * oracle-BOUND by a query where the cap bites; entity resolution's
  * blocking had the same unguarded failure mode — a block key hot on
  * BOTH record sets (placeholder names: "UNKNOWN", "N/A", re-used
  * registry rows at a fixed fraction of each side) makes candidate
  * pairs quadratic in corpus size — and now has the same guard shape
  * (`maxBlockDf` stop-list, EntityResolution.candidates) and, here,
  * the same binding oracle.
  */
object R35Queries {

  /** maxBlockDf for the binding run. At 2, digit-neighborhood keys
    * (e.g. the last-digit deletion "Customer#00000001", shared by ~10
    * clean names and the ~3 exact-copy dirty records among them) are
    * stop-listed, and the truncation-slice pairs — whose ONLY shared
    * key is exactly such a key (the truncated name IS the clean name's
    * last-char-deletion key) — drop out: capped ≠ exact at both probe
    * scales, so a guard bug cannot hide behind the exact path.
    */
  private val CapDf = 2

  val all: Seq[Q] = Seq(

    Q("er_blocked_capped",
      "The hot-block guard of deletion-neighborhood ER blocking, made " +
        "to BIND: bestMatch with maxBlockDf = " + CapDf + " (production " +
        "guard for placeholder-name junk density — a key with document " +
        "frequency > cap on BOTH sides is stop-listed before the key " +
        "join, so per-key candidate volume keeps min(lc,rc) <= cap and " +
        "the total stays linear in corpus; the stop-list is bounded by " +
        "keys/cap and broadcast). Df is document frequency regardless " +
        "of input (deletionKeys dedups per record). Oracle replays the " +
        "per-side key counts, the both-sides-hot stop-list, and the " +
        "filtered join bit-for-bit.",
      (s, d) => EntityResolution.bestMatch(
        R10Queries.dirtyCustomers(s, d).withColumnRenamed("id", "dirty_id"),
        "dirty_id",
        R10Queries.cleanCustomers(s, d).withColumnRenamed("id", "clean_id"),
        "clean_id",
        "name", maxDist = 1, maxBlockDf = Some(CapDf.toLong)),
      Some(s"""WITH ${R10Queries.erSourceCtes},
              |${R10Queries.erKeyCtes},
              |hotk AS (
              |  SELECT k FROM
              |    (SELECT k, count(*) AS rc FROM ck GROUP BY k) c
              |    JOIN (SELECT k, count(*) AS lc FROM dk GROUP BY k) d
              |      USING (k)
              |  WHERE lc > $CapDf AND rc > $CapDf),
              |cand AS (
              |  SELECT DISTINCT d.id AS dirty_id, d.name AS dn,
              |                  c.id AS clean_id, c.name AS cn
              |  FROM (SELECT id, name, k FROM dk
              |        WHERE k NOT IN (SELECT k FROM hotk)) d
              |  JOIN (SELECT id, name, k FROM ck
              |        WHERE k NOT IN (SELECT k FROM hotk)) c USING (k)),
              |ver AS (
              |  SELECT dirty_id, clean_id,
              |    CAST(levenshtein(dn, cn) AS BIGINT) AS dist
              |  FROM cand WHERE levenshtein(dn, cn) <= 1),
              |best AS (
              |  SELECT dirty_id, clean_id, dist,
              |    row_number() OVER (PARTITION BY dirty_id
              |      ORDER BY dist, clean_id) AS rn
              |  FROM ver)
              |SELECT dirty_id, clean_id, dist FROM best WHERE rn = 1
              |ORDER BY dirty_id""".stripMargin))
  )
}
