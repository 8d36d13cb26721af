package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.FanoutHint

/** Per-query opt-in list for the scan fan-out rewrite (Tables.fanout).
  *
  * Round 16 shipped the fan-out DEFAULT-ON and the full-suite A/B
  * (bench_results/r16_baseline.json vs r16_fanout.json, 315 queries,
  * best-of-2 passes each) measured that as a 1.20x geomean
  * pessimization: 179/314 queries >10% slower (the exchange + its
  * sortBeforeRepartition local sort is pure overhead when per-row work
  * is cheap), ~48 queries much faster (up to 10x — CPU-heavy
  * scan-adjacent stages: shingling, regex chains, vector math, sketch
  * building — that were running on ONE core because the sf-scale
  * parquet inputs are single-split). This list is exactly those
  * measured winners: every name below had `fanout_best / baseline_best
  * <= 0.75` AND an absolute saving >= 0.1 s in that A/B (selection
  * script: tools/fanout_winners.py re-derives it from the two files).
  * Combined measured saving: ~53 s of a 432 s suite.
  *
  * The hint is construction-scoped (FanoutHint.withFanout around
  * `Q.run`) and only ever WIDENS a low-split scan; results are
  * content-identical (oracle-pinned). At 100 TB the trigger inside
  * Tables.fanout is a no-op (splits >> cores), so the list costs
  * nothing at scale — it exists to keep the measured local/small-SF
  * wins without re-imposing the measured losses on everyone else.
  */
object FanoutHints {
  /** r17 additions: a fresh solo A/B on the r17 code (best-of-2 bench
    * passes per side, fanout forced on vs off, sf0.1 local[32]) over the
    * 24 most expensive queries measured these five at ratio <= 0.85 with
    * >= 0.5 s absolute saving each (er_cluster 0.63x/-2.5 s,
    * dedup_recall_sweep 0.80x/-1.2 s, dedup_recall 0.81x/-0.8 s,
    * graph_pagerank 0.83x/-0.6 s, graph_bfs 0.84x/-0.5 s — numbers in
    * OPTIMIZATION_r17.md). The r16 list's 0.75 cutoff had excluded them;
    * the 0.85-0.92 band from the same A/B (graph_modularity,
    * dedup_cluster, graph_linkpred, graph_walks_biased) is inside
    * run-to-run noise and stays out.
    */
  private val r17Winners: Set[String] = Set(
    "er_cluster", "dedup_recall", "dedup_recall_sweep",
    "graph_pagerank", "graph_bfs",
    // re-A/B'd AFTER the cached-plan-AQE hints landed: shrinking the
    // loop overhead made the single-split scan stage dominant for
    // these three (0.75x/0.84x/0.84x, >= 0.4 s each); mm_pipeline and
    // graph_modularity re-measured as losers (1.32x / 1.09x) and stay
    // out
    "graph_linkpred", "dedup_stats", "graph_kcore")

  val names: Set[String] = r17Winners ++ Set(
    "dedup_contamination", "dedup_editdist", "dedup_embedding", "dedup_span_frac",
    "dedup_spans", "dq_drift_sketch", "dq_profile", "dq_profile_sketch",
    "dx_truncate", "er_blocked", "er_golden", "er_metrics",
    "ev_json", "graph_ppr", "inc_profile_sketch", "ml_knn",
    "mm_meta", "mm_neardup", "mm_phash", "q21_quantile",
    "q30_unpivot", "sim_graphann", "sim_graphann_layout", "sim_hardneg",
    "sim_quant", "sim_randproj", "sim_recall_graphann", "sim_recall_ivfadc",
    "sim_recall_lsh", "sim_recall_quant", "sim_recall_randproj", "sim_recall_randproj_sweep",
    "sim_sparse", "ta_bpe_encode", "ta_c4", "ta_chunk",
    "ta_cms", "ta_fertility", "ta_gopher", "ta_gopher_colform",
    "ta_gopher_rep", "ta_quality", "ta_redact", "ta_repetition",
    "ta_subword", "ta_tokens", "ta_unigram_encode", "ta_winnow")

  def wrap(name: String,
           run: (SparkSession, String) => DataFrame): (SparkSession, String) => DataFrame =
    if (!names(name)) run
    else (spark, dir) => FanoutHint.withFanout(run(spark, dir))
}
