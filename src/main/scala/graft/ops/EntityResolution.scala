package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Entity resolution / record linkage over structured records: find which
  * dirty records (typos, truncations, re-keyed copies) refer to the same
  * real-world entity as a clean registry row — the classic
  * blocking → pairwise-verify → cluster pipeline, distinct from document
  * dedup (which fingerprints long text; here the match unit is a short
  * identifying string and the metric is edit distance).
  *
  * Blocking is the FastSS / SymSpell deletion neighborhood (Bocek et al.
  * 2007, "Fast Similarity Search in Large Dictionaries"): each string
  * emits itself plus every single-character deletion as block keys. Two
  * strings within edit distance 1 PROVABLY share a key (substitution →
  * both delete the edited position; insertion/deletion → the longer
  * side's deletion hits the shorter; equality → the identity key), so
  * unlike phonetic or prefix blocking this never misses a true match at
  * the configured radius — the candidate generation is EXACT, and
  * levenshtein verification only removes false positives.
  *
  * Scale shape: L+1 keys per record of length L (strings here are short
  * identifiers, so ~20 keys), an equi-join on the key — never a cross
  * join — and per-key fan-out bounded by how many records actually share
  * a deletion variant (the near-duplicate density itself, the quantity
  * being measured). Verification runs per CANDIDATE pair, and the
  * best-match reduction is a plain aggregate (min of a (dist, id)
  * struct), not a window, so nothing corpus-sized crosses more than the
  * one key exchange.
  */
object EntityResolution {

  /** The deletion-neighborhood block keys of a string column: the string
    * itself plus each single-character deletion, deduplicated. Pure
    * codegen'd array expression — no UDF.
    */
  def deletionKeys(nameColName: String): Column =
    expr(s"""array_union(array($nameColName),
            |  transform(sequence(1, length($nameColName)),
            |    i -> concat(substr($nameColName, 1, i-1),
            |                substr($nameColName, i+1, length($nameColName)))))"""
      .stripMargin)

  /** Candidate pairs via deletion-neighborhood blocking: every (left,
    * right) pair sharing at least one block key, each pair exactly once.
    * Exact at radius 1 by the FastSS property; pairs at larger true
    * distance may appear (false positives) and are removed by
    * [[verifiedPairs]].
    *
    * `maxBlockDf` is the hot-block guard, the ER sibling of
    * [[Dedup]]'s `maxBandDf`/`maxBenchDf` caps: a block key whose
    * document frequency exceeds the cap on BOTH sides is stop-listed
    * before the join. Per-key candidate volume is lc(k)·rc(k); keys
    * hot on only one side stay linear (≤ cap·lc(k)+cap·rc(k) after the
    * guard caps the other side of every surviving key), but a key hot
    * on both sides — the placeholder-name failure mode of real dirty
    * data ("UNKNOWN", "N/A", empty-string registry rows, at a FIXED
    * FRACTION of each side) — is quadratic in corpus size, and the
    * pairs it generates are exactly the semantically-worthless ones
    * (identical junk matching identical junk). With the guard every
    * surviving key satisfies min(lc,rc) ≤ cap, so total candidates ≤
    * cap·Σ(lc+rc) = O(cap · corpus keys) — linear by construction.
    * Df is DOCUMENT frequency regardless of input data: each record
    * emits each key at most once ([[deletionKeys]] array_union-dedups),
    * so the per-key count IS the number of distinct records. The
    * stop-list is ≤ keys/cap rows per side — which still GROWS with
    * the corpus, so it is broadcast only while provably small
    * ([[graft.core.Broadcasts.bounded]]: materialize, count, hint
    * below the row bound; above it the anti-joins fall back to
    * shuffled joins instead of OOMing the driver at exactly the scale
    * the guard exists for).
    */
  def candidates(left: DataFrame, leftId: String, right: DataFrame,
                 rightId: String, nameCol: String,
                 maxBlockDf: Option[Long] = None): DataFrame = {
    val lk = left
      .select(col(leftId), col(nameCol).as("__ln"))
      .withColumn("__k", explode(deletionKeys("__ln")))
    val rk = right
      .select(col(rightId), col(nameCol).as("__rn"))
      .withColumn("__k", explode(deletionKeys("__rn")))
    val (lf, rf) = maxBlockDf match {
      case Some(cap) =>
        val hot = graft.core.Broadcasts.bounded(
          lk.groupBy("__k").agg(count(lit(1)).as("__lc"))
            .join(rk.groupBy("__k").agg(count(lit(1)).as("__rc")), "__k")
            .filter(col("__lc") > cap && col("__rc") > cap)
            .select("__k"))
        (lk.join(hot, Seq("__k"), "left_anti"),
          rk.join(hot, Seq("__k"), "left_anti"))
      case None => (lk, rk)
    }
    lf.join(rf, "__k")
      .select(col(leftId), col("__ln"), col(rightId), col("__rn"))
      .distinct()
  }

  /** Blocked candidates verified by true edit distance ≤ `maxDist`.
    * Output: (leftId, rightId, dist). With the radius-1 blocking above,
    * maxDist = 1 makes the whole pipeline EXACT: blocking guarantees no
    * missed pair, verification guarantees no spurious one.
    */
  def verifiedPairs(left: DataFrame, leftId: String, right: DataFrame,
                    rightId: String, nameCol: String,
                    maxDist: Int = 1,
                    maxBlockDf: Option[Long] = None): DataFrame =
    candidates(left, leftId, right, rightId, nameCol, maxBlockDf)
      .withColumn("dist", levenshtein(col("__ln"), col("__rn")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select(col(leftId), col(rightId), col("dist"))

  /** Best match per left record: the (lowest-distance, then lowest
    * right-id) verified pair — one aggregate over the pair relation
    * (min of a (dist, id) struct sorts lexicographically), no window.
    */
  def bestMatch(left: DataFrame, leftId: String, right: DataFrame,
                rightId: String, nameCol: String,
                maxDist: Int = 1,
                maxBlockDf: Option[Long] = None): DataFrame =
    verifiedPairs(left, leftId, right, rightId, nameCol, maxDist, maxBlockDf)
      .groupBy(col(leftId))
      .agg(min(struct(col("dist"), col(rightId))).as("__b"))
      .select(col(leftId), col(s"__b.$rightId").as(rightId),
        col("__b.dist").as("dist"))
      .orderBy(col(leftId))

  /** Entity clusters over the union of both record sets — RESOLVE THEN
    * GROUP: each left record contributes its single [[bestMatch]] edge
    * (not every verified pair: with identifier-like names every
    * one-digit neighbor is a legitimate distance-1 pair, and clustering
    * ALL of them chains unrelated entities into mega-components — the
    * false-merge failure mode golden-record grouping exists to avoid),
    * then connected components (the shared
    * [[Dedup.connectedComponents]] pointer-jumping loop) groups records
    * around their resolved entities, records matching nothing kept as
    * singleton clusters. A component is therefore a clean entity plus
    * every dirty record resolved to it — never two clean entities
    * merged. Output: (id, cluster, cluster_size).
    */
  def clusters(left: DataFrame, leftId: String, right: DataFrame,
               rightId: String, nameCol: String,
               maxDist: Int = 1,
               maxBlockDf: Option[Long] = None): DataFrame = {
    val pairs = bestMatch(left, leftId, right, rightId, nameCol, maxDist,
      maxBlockDf)
    val labels = Dedup.connectedComponents(pairs, leftId, rightId)
    // distinct: an id appearing in BOTH record sets would otherwise emit
    // duplicate membership rows and double-count in cluster_size (ids
    // are usually disjoint by construction, but the operator shouldn't
    // silently corrupt sizes when they aren't)
    val vertices = left.select(col(leftId).as("id"))
      .union(right.select(col(rightId).as("id")))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("cluster"))
    vertices.join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("label"), col("id")).as("cluster"))
      .withColumn("cluster_size", count(lit(1)).over(w))
      .orderBy(col("id"))
  }

  /** BLOCKING-QUALITY metrics — the report that justifies the
    * deletion-neighborhood blocking before anyone trusts its output at
    * scale: record counts, the quadratic pair space the blocking
    * avoided, candidates actually generated, verified matches, matched
    * left records, and the derived reduction ratio / match rate. Every
    * input is an exact integer from one aggregate per relation (1-row
    * frames, broadcast-crossed); the pair space accumulates in
    * DECIMAL(38,0) so 1e9×1e9 record sets don't overflow. The ratios
    * are the only doubles — fixed expressions over the exact counts.
    */
  def blockingMetrics(left: DataFrame, leftId: String, right: DataFrame,
                      rightId: String, nameCol: String,
                      maxDist: Int = 1,
                      maxBlockDf: Option[Long] = None): DataFrame = {
    val Dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val nl = left.agg(count(lit(1)).as("n_left"))
    val nr = right.agg(count(lit(1)).as("n_right"))
    // ONE pass over the candidate relation for all three pair-level
    // counts (candidates / verified / matched-left): the naive three
    // separate frames each recompute the explode→join→distinct chain —
    // the blocking work this report exists to meter — tripling the
    // dominant cost. count-if + countDistinct-if over the same rows is
    // plan-identical output at a third of the scans (the r14
    // ml_bootstrap double-scan lesson, applied here; count-if, not
    // sum-if, so an EMPTY candidate relation reports 0, not NULL).
    // maxBlockDf threads through so the report can describe the capped
    // configuration the pipeline actually ships with — a report of the
    // raw blocking would itself pay the hot-block quadratic the guard
    // exists to remove.
    val stats = candidates(left, leftId, right, rightId, nameCol,
        maxBlockDf)
      .withColumn("__d", levenshtein(col("__ln"), col("__rn")).cast("long"))
      .agg(count(lit(1)).as("n_candidates"),
        count(when(col("__d") <= maxDist, lit(1))).as("n_verified"),
        countDistinct(when(col("__d") <= maxDist, col(leftId)))
          .as("n_matched"))
    val possible = col("n_left").cast(Dec) * col("n_right").cast(Dec)
    nl.crossJoin(broadcast(nr)).crossJoin(broadcast(stats))
      .select(col("n_left"), col("n_right"),
        possible.cast("string").as("n_possible"),
        col("n_candidates"), col("n_verified"), col("n_matched"),
        (lit(1.0) - col("n_candidates").cast("double") /
          possible.cast("double")).as("reduction_ratio"),
        (col("n_matched").cast("double") / col("n_left").cast("double"))
          .as("match_rate"))
  }

  /** GOLDEN-RECORD survivorship over [[clusters]] — the MDM merge step
    * after resolution: each cluster elects one canonical record by the
    * deterministic preference (clean-source first, then longest name,
    * then lexicographically/id-greatest — a single struct-max, the
    * dedup_survivor argmax pattern, so no per-cluster sort), and
    * reports membership counts beside it. One attrs join co-partitioned
    * on the id key + one cluster-keyed aggregate; output is
    * clusters-sized.
    */
  def golden(left: DataFrame, leftId: String, right: DataFrame,
             rightId: String, nameCol: String,
             maxDist: Int = 1,
             maxBlockDf: Option[Long] = None): DataFrame = {
    val cl = clusters(left, leftId, right, rightId, nameCol, maxDist,
      maxBlockDf)
      .select(col("id"), col("cluster"))
    val attrs = right.select(col(rightId).as("id"),
        col(nameCol).as("name"), lit(true).as("__clean"))
      .unionByName(left.select(col(leftId).as("id"),
        col(nameCol).as("name"), lit(false).as("__clean")))
    cl.join(attrs, Seq("id"))
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_members"),
        sum(when(col("__clean"), 1L).otherwise(0L)).as("n_clean"),
        max(struct(col("__clean").as("c"), length(col("name")).as("l"),
          col("name").as("n"), col("id").as("i"))).as("__p"))
      .select(col("cluster"), col("n_members"), col("n_clean"),
        col("__p.i").as("golden_id"), col("__p.n").as("golden_name"))
      .orderBy(col("cluster"))
  }
}
