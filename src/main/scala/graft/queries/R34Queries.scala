package graft.queries

import graft.core.Tables
import graft.ops.Dedup

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
           |ORDER BY id_a, id_b""".stripMargin))
  )
}
