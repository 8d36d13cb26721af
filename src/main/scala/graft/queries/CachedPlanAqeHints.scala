package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.CachedPlanAqe

/** Per-query opt-in list for AQE-sized cached-plan partitioning
  * ([[graft.core.CachedPlanAqe]]).
  *
  * Selection is measured, not guessed: the r17 full-suite A/B (315
  * queries, best-of-2 passes per side, sf0.1 local[32]; session flag
  * forced off vs on via SPARK_GRAFT_CACHED_PLAN_AQE) gave geomean
  * 0.906 — a disallowed default flip (tools/flip_check.py) — with the
  * wins concentrated in the loop/cache-heavy queries. This list is
  * every query with `on_best / off_best <= 0.85` AND an absolute
  * saving >= 0.3 s in that A/B (~22 s of a 357 s suite, numbers in
  * OPTIMIZATION_r17.md). At corpus scale the flag is behavior-neutral
  * for these queries: AQE sizes the cached plan from measured bytes,
  * so a large cache keeps its width.
  */
object CachedPlanAqeHints {
  val names: Set[String] = Set(
    "dedup_cluster_incremental", "dedup_editdist", "dedup_recall",
    "dedup_recall_sweep", "dedup_survivor", "doc_mix_temperature",
    "dq_ks", "er_cluster", "er_golden", "graph_assortativity",
    "graph_bfs", "graph_degree_dist", "graph_kcore", "graph_modularity",
    "graph_pagerank", "graph_walks_biased", "ml_auc", "ml_roc",
    "mm_pipeline", "stream_dedup_index", "ta_bm25", "ta_keywords_rank",
    "ta_kneser", "ta_mmr")

  def wrap(name: String,
           run: (SparkSession, String) => DataFrame): (SparkSession, String) => DataFrame =
    if (!names(name)) run
    else (spark, dir) => CachedPlanAqe.withCachedPlanAqe(spark)(run(spark, dir))
}
