package graft.queries

import graft.core.Tables
import graft.ops.Profile

/** Round-9 session-6, batch 6: deterministic bootstrap uncertainty
  * quantification.
  */
object R27Queries {

  private val Reps = 64
  // CI positions are computed against the SURVIVING replicate count
  // (zero-mass replicates are filtered on both sides — see
  // Profile.bootstrapMeanCI), so both engines index the same array.

  val all: Seq[Q] = Seq(

    Q("ml_bootstrap",
      "Deterministic Poisson-bootstrap 95% CI for mean document length " +
        "- uncertainty quantification with the reproducibility " +
        "contract: replicate multiplicities are a pure function of " +
        "md5(doc_id, replicate) (two hex digits quantize Poisson(1) " +
        "to {0..4} at 94/94/47/16/5-per-256), so engines and reruns " +
        "agree bit-for-bit. ONE scan fans rows to 64 replicates " +
        "(map-side combined), per-replicate sums are exact integers, " +
        "each mean is one division, and the CI bounds are order " +
        "statistics of the 64 means - nothing data-sized sorts.",
      (s, d) => Profile.bootstrapMeanCI(Tables.documents(s, d),
        "doc_id", "n_chars", reps = Reps, alpha = 0.05),
      Some(s"""WITH r AS (
              |  SELECT CAST(doc_id AS VARCHAR) AS k, n_chars AS v
              |  FROM documents
              |  WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL),
              |reps AS (SELECT unnest(generate_series(0, ${Reps - 1}))
              |         AS b),
              |m AS (
              |  SELECT r.k, r.v, reps.b,
              |    CASE
              |      WHEN CAST(('0x' || substring(md5(r.k || '_' ||
              |        CAST(reps.b AS VARCHAR)), 1, 2)) AS INT) <= 93
              |        THEN 0
              |      WHEN CAST(('0x' || substring(md5(r.k || '_' ||
              |        CAST(reps.b AS VARCHAR)), 1, 2)) AS INT) <= 187
              |        THEN 1
              |      WHEN CAST(('0x' || substring(md5(r.k || '_' ||
              |        CAST(reps.b AS VARCHAR)), 1, 2)) AS INT) <= 234
              |        THEN 2
              |      WHEN CAST(('0x' || substring(md5(r.k || '_' ||
              |        CAST(reps.b AS VARCHAR)), 1, 2)) AS INT) <= 250
              |        THEN 3
              |      ELSE 4 END AS m
              |  FROM r, reps),
              |means AS (
              |  SELECT b,
              |    CAST(sum(m * v) AS DOUBLE) / CAST(sum(m) AS DOUBLE)
              |      AS mean
              |  FROM m GROUP BY b HAVING sum(m) > 0),
              |ord AS (
              |  SELECT mean, row_number() OVER (ORDER BY mean) AS rn,
              |    count(*) OVER () AS nr
              |  FROM means)
              |SELECT count(*) AS n_rows,
              |  CAST(sum(v) AS DOUBLE) / CAST(count(*) AS DOUBLE)
              |    AS mean,
              |  (SELECT mean FROM ord
              |   WHERE rn = GREATEST(1, CAST(ceil(0.025 * nr) AS INT)))
              |    AS ci_lo,
              |  (SELECT mean FROM ord
              |   WHERE rn = LEAST(nr, CAST(ceil(0.975 * nr) AS INT)))
              |    AS ci_hi,
              |  CAST($Reps AS BIGINT) AS reps
              |FROM r""".stripMargin)))
}
