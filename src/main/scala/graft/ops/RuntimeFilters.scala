package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit runtime-filter (semi-join reduction) operators: shrink the
  * shuffled side of a big join BEFORE the exchange using a compact
  * no-false-negative summary of the other side.
  *
  * Spark's optimizer injects its own runtime bloom filters only under
  * narrow heuristics (`spark.sql.optimizer.runtime.bloomFilter.*` —
  * creation-side size thresholds, one filter per join, plan-shape
  * restrictions); this is the EXPLICIT version for when the pipeline
  * author knows the reduction pays: the dim side is too big to
  * broadcast-join outright, but its KEY SET compresses into a few MB of
  * bloom filter that every fact-side task can hold.
  *
  * Reference analogue: the label join of `dx_group/mvp_pipe.py` filters
  * the fact frame by `isin(labels)` before merging; this is that idea
  * made shuffle-aware.
  */
object RuntimeFilters {

  /** Inner equi-join where the FACT side is pre-filtered by a bloom
    * filter built over the dim side's join keys, then exact-joined.
    * Bloom filters have no false negatives, so the prefilter only drops
    * rows that could never match, and the exact join clears the ~fpp
    * false positives — the result is EXACTLY the plain inner join (the
    * oracle for `q29_bloom_join` is exactly that SQL).
    *
    * 100 TB shape: the plain join shuffles the ENTIRE fact table on the
    * join key even when the (filtered) dim side matches 1% of it. Here
    * the dim scan runs once to build the filter (distributed partial
    * aggregation — only the fixed-size filter reaches the driver), the
    * filter probe is a NATIVE codegen'd expression
    * (`BloomFilterMightContain` over `xxhash64`, the
    * [[Dedup.newAgainstHistory]] seam) applied at the fact SCAN, and
    * only ~(match_rate + fpp) of the fact rows pay the exchange. The
    * bloom build is an EAGER job at call time — that scan is the price
    * of shrinking the join; at a 1000-executor cluster it is the
    * difference between exchanging 100 TB and exchanging the matching
    * fraction of it.
    *
    * Null fact keys: `xxhash64(null)` hashes the seed, so a null key
    * either drops at the prefilter or reaches the join, where it never
    * matches — dropped either way, same as the plain inner join.
    */
  def bloomReducedJoin(fact: DataFrame, dim: DataFrame,
                       factKey: String, dimKey: String,
                       expectedItems: Long = 1000000L,
                       fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.graft.Shims
    val bf = Dedup.buildHistoryBloom(dim.select(col(dimKey)), dimKey,
      expectedItems, fpp)
    // empty dim side → the filter aggregate yields null → empty join
    val pruned =
      if (bf == null) fact.filter(lit(false))
      else fact.filter(Shims.bloomMightContain(bf, xxhash64(col(factKey))))
    pruned.join(dim, col(factKey) === col(dimKey))
  }
}
