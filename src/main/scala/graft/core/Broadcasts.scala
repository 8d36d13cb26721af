package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Size-bounded broadcast hints for DERIVED relations (stop-lists,
  * hot-key lists) whose size the planner cannot estimate (they sit
  * behind aggregations/explodes) and the CALLER cannot bound a priori:
  * a hot-shingle or hot-block stop-list grows with the corpus, so a
  * blanket `broadcast(...)` hint is exactly the guard-OOMs-the-driver
  * failure mode at the scale the guard exists to protect
  * (optimization guide §3.1/§5 — a few hundred MB of broadcast is
  * fine, multiple GB is a driver OOM, 8 GB/512M rows is a hard cap).
  *
  * [[bounded]] materializes the relation once (cached via [[Caches]],
  * so the measuring count and the subsequent join share the work),
  * counts it, and hint-broadcasts only below `maxRows`; above it the
  * relation is returned unhinted and the join planner falls back to a
  * plain shuffled join — slower, never fatal. The count is an eager
  * job at composition time; for the stop-list use cases that work was
  * about to run anyway and the cache makes it single-pass.
  */
object Broadcasts {
  /** Conservative default: stop-list rows are short strings/longs, so
    * 4M rows is tens-to-~150 MB broadcast — inside the guide's
    * comfortable range on both driver and executors, far from the
    * 512M-row hard cap. Deployments override per session via
    * `graft.broadcast.maxRows`.
    */
  val DefaultMaxRows: Long = 4L * 1000 * 1000

  def bounded(df: DataFrame, maxRows: Long = -1L): DataFrame = {
    val bound =
      if (maxRows >= 0) maxRows
      else Config.confLong(df.sparkSession,
        "graft.broadcast.maxRows", DefaultMaxRows)
    val cached = Caches.track(df)
    if (cached.count() <= bound) broadcast(cached) else cached
  }
}
