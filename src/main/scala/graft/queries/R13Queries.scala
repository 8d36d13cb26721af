package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.Similarity

/** Round-9 session queries: the IVFADC at-rest LIFECYCLE gate (VERDICT
  * r8 ask #1 — delete/compact/vacuum/as-of on the compressed layout was
  * structural-but-unexercised), plus the rest of the r8 task list as
  * they land.
  */
object R13Queries {

  private def scratch(prefix: String, d: String): String =
    sys.props.getOrElse("java.io.tmpdir", "/tmp") +
      "/" + prefix + "_" + d.replaceAll("[^A-Za-z0-9.]", "_")

  /** The sim_ivfadc_append oracle with the tombstoned ids excluded from
    * SERVING (not from training — deleted rows shaped the quantizers;
    * they just never reach the ADC shortlist): train coarse + residual
    * codebooks on the base slice, assign/encode the full corpus, probe
    * with `vec_id % 9 <> 5` filtered inside the scoring CTE. Exactly
    * what compacting served-minus-tombstones into one batch serves.
    */
  private lazy val adcLifecycleOracle: String =
    s"""WITH tr AS (
       |  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 4 <> 1),
       |${R8Queries.ivfAdcChainOn("tr", Some("vec_id % 4 <> 1"),
          servePred = Some("r.vec_id % 9 <> 5"))},
       |${R8Queries.rescoreTail}""".stripMargin

  val all: Seq[Q] = Seq(

    Q("sim_ivfadc_lifecycle",
      "The COMPRESSED vector index lifecycle under one gate (the " +
        "sim_ivf_lifecycle chain on the IVFADC layout): build on " +
        "vec_id % 4 <> 1 with the persisted frozen quantizer pair, " +
        "append the held-out quarter encoded with those SAME persisted " +
        "quantizers, tombstone-delete vec_id % 9 = 5, COMPACT " +
        "served-minus-tombstones into one fresh batch — rows keep " +
        "their persisted coarse assignment AND pq codes; nothing is " +
        "re-encoded — via the shared atomic supersede marker, VACUUM " +
        "the superseded directories, then probe: code-only ADC scan " +
        "over the single surviving batch + exact rescore. Oracle: the " +
        "append chain (train on the slice, encode the union) with the " +
        "deleted ids excluded from serving — rebuild-over-survivors-" +
        "with-frozen-quantizers is the gated definition of ADC " +
        "compaction correctness.",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val rest = emb.filter(col("vec_id") % 4 === 1)
        val qv = Similarity.vectorOf(emb, "vec_id", "embedding", 0L)
        val path = scratch("graft_ivfadc_lc", d)
        Similarity.ivfAdcWriteLayout(R9Queries.baseSlice(s, d),
          "vec_id", "embedding", path,
          kCoarse = 4, coarseIters = 1, m = 4, k = 8, iters = 1,
          dims = 64, trainedCoarse = Some(R9Queries.baseCoarse(s, d)),
          trainedBooks = Some(R9Queries.baseBooks(s, d)))
        Similarity.ivfAdcAppendLayout(rest, "vec_id", "embedding", path,
          batchId = 1L)
        Similarity.ivfDeleteLayout(
          emb.filter(col("vec_id") % 9 === 5).select("vec_id"), "vec_id",
          path, batchId = 2L)
        Similarity.ivfCompactLayout(s, path, "vec_id", newBatchId = 3L)
        Similarity.ivfVacuumLayout(s, path)
        Similarity.ivfAdcProbeLayout(s, path, qv, k = 10, nprobe = 2,
          rescore = 50)
      },
      Some(adcLifecycleOracle))
  )
}
