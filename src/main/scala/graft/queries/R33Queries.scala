package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.Dedup

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
      })
  )
}
